"""Probe 4: container-shape hypothesis for the binary scan's 60 GB/s wall.

probe_binary_bw.py showed EVERY reader of the (36, N) packed-words array —
pallas floor kernels in u32/f32/i8/bf16, padded sublanes, even a plain XLA
reduction — lands at 53-81 GB/s, while the int8 matmul kernel reads its
(1152, N) matrix at ~460 GB/s. Remaining variable: the container's
ROW COUNT (sublane extent). The packed words reshape FOR FREE to taller
containers (C-order: (W, N) -> (W*8, N/8) -> (W*32, N/32)), keeping
original-column == flat index of the (groups, cols) output.

Variants (all q-dependent — a q-independent step could be hoisted out of
the measurement scan as loop-invariant):
  rows36    (36, N) u32, block (36, 16384)     [current container]
  rows288   (288, N/8) u32, block (288, 2048)  [grouped-as-2D]
  rows1152  (1152, N/32) u32, block (1152, 512)[int8-matrix aspect]
  rows1152_fat  same, block (1152, 2048)       [4x bytes/step]
  int8_mm   int8_scores_pallas calibration (correctly padded)
  single-shot sanity on the winner (chain-protocol cross-check)

Each variant computes the REAL workload (AND + popcount + accumulate) so
the winner's number is directly the new scan kernel's floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_binary_tall.py
"""

from __future__ import annotations

import time

import numpy as np

N = 1 << 20
D = 1152
W = D // 32
CHAIN = 16
SAMPLES = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    MB = W * N * 4 / 1e6
    print(f"backend={jax.default_backend()} N={N} bytes={MB:.0f}MB", flush=True)

    @jax.jit
    def make_words(key):
        return jax.random.randint(
            key, (W, N), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        ).astype(jnp.uint32)

    words_t = make_words(jax.random.PRNGKey(0))
    words_t.block_until_ready()
    try:
        print("words_t format:", words_t.format, flush=True)
    except Exception as e:  # noqa: BLE001
        print("words_t format: n/a", e, flush=True)

    qwords = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, (CHAIN, W), dtype=np.uint32)
    )

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

    def report(tag, ms):
        results[tag] = round(ms, 3)
        print(f"{tag}: {ms:.3f} ms = {MB/ms:.0f} GB/s", flush=True)

    # Generic tall-container scan: rows = W * gsz, row r = w*gsz + g holds
    # word w of column group g; q word for block-row w broadcasts from SMEM.
    def tall_scan(gsz, tile, cp=None):
        rows = W * gsz
        ncols = N // gsz
        num_tiles = ncols // tile

        def kern(q_ref, m_ref, out_ref):
            acc = jnp.zeros((gsz, tile), jnp.int32)
            for w in range(W):
                acc = acc + jax.lax.population_count(
                    jnp.bitwise_and(
                        m_ref[w * gsz:(w + 1) * gsz, :], q_ref[0, w]
                    )
                ).astype(jnp.int32)
            out_ref[:] = acc

        call = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((gsz, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((gsz, ncols), jnp.int32)],
            compiler_params=cp,
        )

        def step(q, m):
            out = call(q[None, :], m)[0]
            return q, out[:, :8]

        return step

    # rows36: current container via gsz=1 (block rows 36, tile 16384)
    report("rows36", chained(tall_scan(1, 16384), words_t))

    m288 = jax.jit(lambda w: jnp.reshape(w, (W * 8, N // 8)))(words_t)
    m288.block_until_ready()
    report("rows288", chained(tall_scan(8, 2048), m288))

    m1152 = jax.jit(lambda w: jnp.reshape(w, (W * 32, N // 32)))(words_t)
    m1152.block_until_ready()
    report("rows1152", chained(tall_scan(32, 512), m1152))

    big = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    try:
        report("rows1152_fat", chained(tall_scan(32, 2048, big), m1152))
    except Exception as e:  # noqa: BLE001
        results["rows1152_fat"] = f"FAIL {str(e)[:120]}"
        print(results["rows1152_fat"], flush=True)

    # ---- int8 matmul calibration, correctly padded ----
    from tpuclip.ops.topk_int8 import INT8_TILE_N, int8_scores_pallas

    n8 = (-(-(N // 8) // INT8_TILE_N)) * INT8_TILE_N

    @jax.jit
    def make_i8mat(key):
        return jax.random.randint(key, (D, n8), -127, 127, jnp.int8)

    mat8 = make_i8mat(jax.random.PRNGKey(1))
    mat8.block_until_ready()
    scales = jnp.ones((n8,), jnp.float32)
    nv = jnp.asarray(n8, jnp.int32)
    q8 = jnp.asarray(
        np.random.default_rng(2).integers(-127, 127, (CHAIN, 1, D), np.int8))

    @jax.jit
    def run_mm(qs, m, s, v):
        def body(carry, q):
            q = q + (carry * 0)
            sc = int8_scores_pallas(q, m, s, v)
            return q, sc[:, :8]

        _, outs = jax.lax.scan(body, jnp.zeros((1, D), jnp.int8), qs)
        return outs

    out = run_mm(q8, mat8, scales, nv)
    _ = np.asarray(out)
    times = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        out = run_mm(q8, mat8, scales, nv)
        _ = np.asarray(out)
        times.append((time.perf_counter() - t0) / CHAIN)
    mm_ms = float(np.percentile(times, 50) * 1000)
    mm_mb = D * n8 / 1e6
    results["int8_mm"] = round(mm_ms, 3)
    print(f"int8_mm ({mm_mb:.0f} MB): {mm_ms:.3f} ms = {mm_mb/mm_ms:.0f} GB/s",
          flush=True)

    # ---- single-shot sanity on the best tall variant ----
    best_g, best_t = (32, 512)
    if isinstance(results.get("rows1152_fat"), float) and \
            results["rows1152_fat"] < results["rows1152"]:
        best_t = 2048
    step = tall_scan(best_g, best_t, big)
    mat = m1152

    @jax.jit
    def one(q, m):
        return step(q, m)[1]

    _ = np.asarray(one(qwords[0], mat))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(one(qwords[0], mat))
        times.append(time.perf_counter() - t0)
    results["single_shot_best"] = round(float(np.percentile(times, 50) * 1000), 3)
    print(f"single_shot rows1152 (incl RPC): {results['single_shot_best']:.3f} ms",
          flush=True)

    # correctness spot-check of the tall mapping: acc[g, j] should be the
    # popcount match count of original column c = g*(N//gsz') + j ... for
    # gsz=32 the flat index of (g, j) in (32, N/32) is g*(N/32)+j == c.
    call_rows = tall_scan(32, 512)
    out = None

    def onestep(q, m):
        return call_rows(q, m)[1]

    got = np.asarray(jax.jit(onestep)(qwords[0], m1152))  # (32, 8)
    wt = np.asarray(words_t)
    qw0 = np.asarray(qwords[0])
    npc = N // 32
    ok = True
    for g in range(32):
        for j in range(8):
            c = g * npc + j
            ref = sum(bin(int(wt[w, c] & qw0[w])).count("1") for w in range(W))
            if int(got[g, j]) != ref:
                ok = False
    results["tall_mapping_exact"] = bool(ok)
    print(f"tall mapping exact (32x8 corner): {ok}", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
