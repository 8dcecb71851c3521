"""Probe 8: binary prefilter paths at 10M rows (the cascade's reason to
exist), plus precision re-measurement at 1M with long chains.

probe_scores640_coupled.py: at 1M the scores+approx exec is below the
tunnel-noise floor for 8/64 chains (its walls moved 63->53 ms while
xla640 moved 37->94); and approx_max_k(640) dropped 12/608 above-boundary
rows — so the production design oversizes the reduction (m = 2x depth)
instead of proof-gating. Here:

  At N=10M (padded):  xla640, scores+approx1280, extract_k20
  At N=1M, chains (16, 128): the same three, noise-resistant

The 10M numbers decide the "10M rows on one chip" story: packed words =
1.44 GB HBM (int8+full needs ~13 GB), device prefilter target <10 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_binary_10m.py
"""

from __future__ import annotations

import time

import numpy as np

D = 1152
W = D // 32
SAMPLES = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpuclip.ops.hamming import (
        BINARY_TILE_N,
        _binary_topk_q1,
        binary_topk_packed_t,
        pack_bits_to_words,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    results = {}

    rng = np.random.default_rng(0)
    qbits = (rng.standard_normal((128, D)) >= 0).astype(np.uint8)
    qwords_all = jnp.asarray(pack_bits_to_words(qbits))

    def wall_p50(step_fn, carry_init, consts, chain):
        inputs = qwords_all[:chain]

        @jax.jit
        def run(inp, *cs):
            def body(carry, x):
                return step_fn(carry, x, *cs)

            _, outs = jax.lax.scan(body, carry_init, inp)
            return outs

        out = run(inputs, *consts)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][-1])
        times = []
        for _ in range(SAMPLES):
            t0 = time.perf_counter()
            out = run(inputs, *consts)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0][-1])
            times.append(time.perf_counter() - t0)
        return float(np.percentile(times, 50) * 1000)

    def slope(tag, step_fn, carry_init, consts, chains):
        try:
            w = {c: wall_p50(step_fn, carry_init, consts, c) for c in chains}
            c1, c2 = chains
            exec_ms = (w[c2] - w[c1]) / (c2 - c1)
            rpc_ms = w[c1] - c1 * exec_ms
            results[tag] = {"exec_ms": round(exec_ms, 3), "rpc_ms": round(rpc_ms, 1)}
            print(f"{tag}: exec={exec_ms:.3f} ms/query rpc={rpc_ms:.1f} "
                  f"(walls c{c1}={w[c1]:.1f} c{c2}={w[c2]:.1f})", flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {str(e)[:150]}"
            print(f"{tag}: {results[tag]}", flush=True)

    def couple(qw, s_carry):
        return jnp.bitwise_xor(qw, (s_carry * 0.0).astype(jnp.uint32))

    def build(n_rows, tag, chains, depth_m=1280):
        n_pad = -(-n_rows // BINARY_TILE_N) * BINARY_TILE_N

        @jax.jit
        def gen(key):
            w = jax.random.randint(
                key, (W, n_pad), minval=jnp.iinfo(jnp.int32).min,
                maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
            ).astype(jnp.uint32)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            return jnp.where(col < n_rows, w, 0)

        words_t = gen(jax.random.PRNGKey(0))
        words_t.block_until_ready()
        n_valid = jnp.asarray(n_rows, jnp.int32)
        np8 = n_pad // 8
        tile_j = BINARY_TILE_N // 8
        num_tiles = np8 // tile_j
        NEG_INF = float("-inf")

        def scores_kern(q_ref, nvalid_ref, m_ref, out_ref):
            base_j = pl.program_id(0) * tile_j
            acc = jnp.zeros((8, tile_j), jnp.int32)
            for w in range(W):
                acc = acc + jax.lax.population_count(
                    jnp.bitwise_and(m_ref[w], q_ref[0, w])
                ).astype(jnp.int32)
            g = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + base_j
            col = g * np8 + jj
            out_ref[:] = jnp.where(col < nvalid_ref[0, 0],
                                   acc.astype(jnp.float32), NEG_INF)

        scores_call = pl.pallas_call(
            scores_kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((W, 8, tile_j), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((8, tile_j), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, np8), jnp.float32)],
        )
        grouped = jnp.reshape(words_t, (W, 8, np8))
        nvalid_arr = jnp.reshape(n_valid, (1, 1))

        def scores_step(carry, qw, g, nv):
            qw = couple(qw, carry)
            flat = jnp.reshape(scores_call(qw[None, :], nv, g)[0], (1, n_pad))
            s, i = jax.lax.approx_max_k(flat, depth_m)
            return s[0, 0], (s, i)

        slope(f"{tag}_scores_m{depth_m}", scores_step,
              jnp.zeros((), jnp.float32), (grouped, nvalid_arr), chains)

        def xla_step(carry, qw, wt, nv):
            qw = couple(qw, carry)
            s, i = binary_topk_packed_t(qw[None, :], wt, 640, n_valid=nv)
            return s[0, 0].astype(jnp.float32), (s, i)

        slope(f"{tag}_xla640", xla_step, jnp.zeros((), jnp.float32),
              (words_t, n_valid), chains)

        def extract_step(carry, qw, wt, nv):
            qw = couple(qw, carry)
            s, i = _binary_topk_q1(qw[None, :], wt, 20, nv, BINARY_TILE_N)
            return s[0, 0].astype(jnp.float32), (s, i)

        slope(f"{tag}_extract20", extract_step, jnp.zeros((), jnp.float32),
              (words_t, n_valid), chains)

        # recall: approx(m) coverage of the exact top-640 boundary
        q0 = qwords_all[:1]
        flat = jnp.reshape(scores_call(q0, nvalid_arr, grouped)[0], (1, n_pad))
        s_a, i_a = jax.lax.approx_max_k(flat, depth_m)
        s_x, i_x = binary_topk_packed_t(q0, words_t, 640, n_valid=n_valid)
        sa = np.asarray(s_a[0])
        sx = np.asarray(s_x[0])
        ia = np.asarray(i_a[0])
        ix = np.asarray(i_x[0])
        t = sx.min()
        results[f"{tag}_above_t_exact"] = int((sx > t).sum())
        results[f"{tag}_above_t_approx"] = int((sa > t).sum())
        results[f"{tag}_overlap640"] = round(
            len(np.intersect1d(ia, ix)) / 640.0, 4)
        print(f"{tag}: above-t exact={results[f'{tag}_above_t_exact']} "
              f"approx(m={depth_m})={results[f'{tag}_above_t_approx']} "
              f"overlap={results[f'{tag}_overlap640']}", flush=True)
        return words_t

    # 1M first (warm + precise), then 10M
    w1 = build(1 << 20, "n1m", (16, 128))
    del w1
    build(10_000_000, "n10m", (4, 16))

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
