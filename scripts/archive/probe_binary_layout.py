"""Probe 2: the binary scan is DMA/LAYOUT-bound, not compute-bound
(probe_binary_scores.py: AND-only floor = 2.40 ms for a 144 MB read =
60 GB/s; popcount and the extraction rounds are ~0.1 ms each). The
grouped (W, 8, tile_j) block gathers 288 strided 8 KB segments per grid
step. This probe measures layout alternatives:

  grouped_16k        current layout, tile_n=16384 (baseline floor)
  grouped_64k        current layout, bigger tile (vmem_limit raised)
  tilecont_16k/64k   TILE-CONTIGUOUS (num_tiles, W, 8, tile_j): one
                     contiguous DMA per grid step
  tilecont_scores    full popcount scores kernel on the winning layout
  tilecont_cascade   scores + approx_max_k(640) (new cascade prefilter)

N is padded to 2^20 so every tile size divides evenly (the first probe's
1M was not a tile multiple — its kernels silently skipped the 576-row
tail, which also broke the exactness check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_binary_layout.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

N = 1 << 20  # 1,048,576 — divides every tile size below
D = 1152
W = D // 32
CHAIN = 16
SAMPLES = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpuclip.ops.hamming import pack_bits_to_words

    print(f"backend={jax.default_backend()} N={N}", flush=True)

    @jax.jit
    def make_words(key):
        return jax.random.randint(
            key, (W, N), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        ).astype(jnp.uint32)

    words_t = make_words(jax.random.PRNGKey(0))
    words_t.block_until_ready()

    rng = np.random.default_rng(0)
    qbits = (rng.standard_normal((CHAIN, D)) >= 0).astype(np.uint8)
    qwords = jnp.asarray(pack_bits_to_words(qbits))

    def chained(step, *consts):
        @jax.jit
        def run(qw, *cs):
            def body(carry, q):
                q = jnp.bitwise_xor(q, carry & jnp.uint32(0))
                return step(q, *cs)

            _, outs = jax.lax.scan(body, jnp.zeros((W,), jnp.uint32), qw)
            return outs

        out = run(qwords, *consts)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][-1])
        times = []
        for _ in range(SAMPLES):
            t0 = time.perf_counter()
            out = run(qwords, *consts)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0][-1])
            times.append((time.perf_counter() - t0) / CHAIN)
        return float(np.percentile(times, 50) * 1000)

    results = {}
    params_big = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---------------- grouped (current) layout floors ----------------
    def grouped_floor(tile_n, compiler_params=None):
        np8 = N // 8
        tile_j = tile_n // 8
        num_tiles = np8 // tile_j

        def kern(q_ref, m_ref, out_ref):
            acc = jnp.zeros((8, tile_j), jnp.int32)
            for w in range(W):
                acc = acc + jnp.bitwise_and(m_ref[w], q_ref[0, w]).astype(jnp.int32)
            out_ref[:] = acc

        call = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((W, 8, tile_j), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((8, tile_j), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, np8), jnp.int32)],
            compiler_params=compiler_params,
        )

        def step(q, g):
            out = call(q[None, :], g)[0]
            return q, jnp.sum(out[:, :8])

        return step

    grouped = jnp.reshape(words_t, (W, 8, N // 8))
    for tile_n, tag, cp in ((16384, "grouped_16k", None),
                            (65536, "grouped_64k", params_big)):
        try:
            results[tag] = chained(grouped_floor(tile_n, cp), grouped)
            print(f"{tag}: {results[tag]:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {str(e)[:120]}"
            print(f"{tag}: {results[tag]}", flush=True)

    # ---------------- tile-contiguous layout ----------------
    def tilecont_floor(tile_n, compiler_params=None):
        tile_j = tile_n // 8
        num_tiles = N // tile_n

        def kern(q_ref, m_ref, out_ref):
            acc = jnp.zeros((8, tile_j), jnp.int32)
            for w in range(W):
                acc = acc + jnp.bitwise_and(m_ref[0, w], q_ref[0, w]).astype(jnp.int32)
            out_ref[:] = acc

        call = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, W, 8, tile_j), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((8, tile_j), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, N // 8), jnp.int32)],
            compiler_params=compiler_params,
        )

        def step(q, tc):
            out = call(q[None, :], tc)[0]
            return q, jnp.sum(out[:, :8])

        return step

    # relayout once on device: (W, num_tiles, 8, tile_j) -> (num_tiles, W, 8, tile_j)
    def make_tilecont(tile_n):
        tile_j = tile_n // 8
        num_tiles = N // tile_n

        @jax.jit
        def relayout(wt):
            # tile WITHIN the grouped j0 axis: grouped (W, 8, np8) element
            # (w, g, j0) = wt[w, g*np8 + j0]; tile i holds j0 in
            # [i*tile_j, (i+1)*tile_j) for all 8 groups. This keeps the
            # scores output's C-order flat index == original column.
            g = jnp.reshape(wt, (W, 8, num_tiles, tile_j))
            # a jit OUTPUT is materialized in the default (C-order) layout
            return jnp.transpose(g, (2, 0, 1, 3))

        tc = relayout(words_t)
        tc.block_until_ready()
        return tc

    tile_winner = None
    for tile_n, tag, cp in ((16384, "tilecont_16k", None),
                            (65536, "tilecont_64k", params_big)):
        try:
            tc = make_tilecont(tile_n)
            results[tag] = chained(tilecont_floor(tile_n, cp), tc)
            print(f"{tag}: {results[tag]:.3f} ms", flush=True)
            if tile_winner is None or results[tag] < results[tile_winner[1]]:
                tile_winner = (tile_n, tag, cp)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {str(e)[:120]}"
            print(f"{tag}: {results[tag]}", flush=True)

    if tile_winner is None:
        print("RESULTS", results, flush=True)
        return

    # ---------------- full scores kernel on the winning layout ----------------
    # IMPORTANT subtlety: the tile-contiguous INPUT tile i holds grouped
    # columns j0 in [i*tile_j, (i+1)*tile_j) for ALL 8 sublane groups g —
    # i.e. original columns g*np8 + j0. Writing the (8, tile_j) acc into an
    # (8, np8) output at block (0, i) preserves exactly that mapping, so the
    # C-order flatten of the output has flat index == original column (same
    # contract as the probe-1 grouped kernel; no in-kernel reshape needed).
    tile_n, _, cp = tile_winner
    tile_j = tile_n // 8
    num_tiles = N // tile_n
    np8 = N // 8
    NEG_INF = float("-inf")

    def scores_kern(q_ref, nvalid_ref, m_ref, out_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((8, tile_j), jnp.int32)
        for w in range(W):
            acc = acc + jax.lax.population_count(
                jnp.bitwise_and(m_ref[0, w], q_ref[0, w])
            ).astype(jnp.int32)
        g = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + i * tile_j
        col = g * np8 + jj  # original column
        out_ref[:] = jnp.where(col < nvalid_ref[0, 0], acc.astype(jnp.float32),
                               NEG_INF)

    scores_call = pl.pallas_call(
        scores_kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, W, 8, tile_j), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, tile_j), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, np8), jnp.float32)],
        compiler_params=cp,
    )

    nvalid_arr = jnp.reshape(jnp.asarray(N, jnp.int32), (1, 1))
    tc = make_tilecont(tile_n)

    def scores_step(q, tcm, nv):
        flat = jnp.reshape(scores_call(q[None, :], nv, tcm)[0], (1, N))
        s, i = jax.lax.approx_max_k(flat, 64)
        return q, (s, i)

    try:
        results["tilecont_scores_approx64"] = chained(scores_step, tc, nvalid_arr)
        print(f"tilecont_scores_approx64 (tile={tile_n}): "
              f"{results['tilecont_scores_approx64']:.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        results["tilecont_scores_approx64"] = f"FAIL {str(e)[:200]}"
        print(results["tilecont_scores_approx64"], flush=True)

    def cascade_step(q, tcm, nv):
        flat = jnp.reshape(scores_call(q[None, :], nv, tcm)[0], (1, N))
        s, i = jax.lax.approx_max_k(flat, 640)
        return q, (s, i)

    try:
        results["tilecont_cascade640"] = chained(cascade_step, tc, nvalid_arr)
        print(f"tilecont_cascade640: {results['tilecont_cascade640']:.3f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        results["tilecont_cascade640"] = f"FAIL {str(e)[:200]}"
        print(results["tilecont_cascade640"], flush=True)

    # ---------------- exactness: scores vs host reference ----------------
    try:
        q0 = qwords[0][None, :]
        got = np.asarray(scores_call(q0, nvalid_arr, tc)[0]).reshape(N)
        # flat index == original column by the output-mapping argument above
        cols = np.random.default_rng(1).integers(0, N, 1000)
        qw0 = np.asarray(q0[0])
        wt = np.asarray(words_t)  # (W, N)
        anded = np.ascontiguousarray(wt[:, cols] & qw0[:, None])
        popc = np.unpackbits(
            anded.view(np.uint8).reshape(W, len(cols), 4), axis=-1,
        ).sum(axis=(0, 2))
        ok = np.array_equal(got[cols].astype(np.int64), popc.astype(np.int64))
        results["exact_spotcheck"] = bool(ok)
        print(f"exact spot-check (1000 cols): {ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        results["exact_spotcheck"] = f"FAIL {str(e)[:200]}"
        print(results["exact_spotcheck"], flush=True)

    print("RESULTS", {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
