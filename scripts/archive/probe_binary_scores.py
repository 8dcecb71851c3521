"""Probe: where does the packed-binary scan's time go, and can a
scores-only kernel + approx_max_k shortlist (the redesign that took the
int8 path from 4.2 to 2.6 ms) do the same for the binary/cascade tier?

Context: the grouped q1 extract kernel measures 2.34 ms at 1M x 1152 —
~62 GB/s effective over a 144 MB read, ~8x off the HBM floor. Suspects:
(a) the k in-kernel extraction rounds, (b) XLA's population_count
lowering (the VPU has no fast 32-bit integer multiply; the classic
popcount bit-trick ends in a 0x01010101 multiply), (c) DMA layout.
The cascade prefilter (depth = max(32k, 512)) additionally falls through
the `k <= 128` pallas gate to the XLA path (33 GB/s measured in r2).

Variants measured (1M x 1152, q=1, chained protocol, host-fetch barrier):
  extract_k20       current _binary_topk_q1 (baseline)
  extract_k1        same kernel, k=1 (isolates extraction rounds)
  scores_native     grouped kernel emitting raw f32 scores, native popcount
  scores_manual     same, hand-written shift/add popcount (no multiply)
  and_floor         AND + add only, no popcount (DMA + issue floor)
  scores_approx640  scores_native + lax.approx_max_k(640) (cascade shape)
  xla_depth640      binary_topk_packed_t at depth 640 (current cascade path)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_binary_scores.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

N = 1_000_000
D = 1152
W = D // 32  # 36 words
CHAIN = 16
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

    # Device-generated packed matrix (host packbits at 1M rows is minutes).
    @jax.jit
    def make_words(key):
        # uniform random bits, word-major (W, N)
        return jax.random.randint(
            key, (W, N), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        ).astype(jnp.uint32)

    words_t = make_words(jax.random.PRNGKey(0))
    words_t.block_until_ready()
    n_valid = jnp.asarray(N, jnp.int32)

    rng = np.random.default_rng(0)
    qbits = (rng.standard_normal((CHAIN, D)) >= 0).astype(np.uint8)
    qwords = jnp.asarray(pack_bits_to_words(qbits))  # (CHAIN, W) uint32

    np8 = N // 8
    tile_j = BINARY_TILE_N // 8
    num_tiles = np8 // tile_j

    NEG_INF = float("-inf")  # python float: pallas rejects traced constants

    def _popcount_manual(x):
        c55 = jnp.uint32(0x55555555)
        c33 = jnp.uint32(0x33333333)
        c0f = jnp.uint32(0x0F0F0F0F)
        x = x - ((x >> jnp.uint32(1)) & c55)
        x = (x & c33) + ((x >> jnp.uint32(2)) & c33)
        x = (x + (x >> jnp.uint32(4))) & c0f
        x = x + (x >> jnp.uint32(8))
        x = x + (x >> jnp.uint32(16))
        return (x & jnp.uint32(0x3F)).astype(jnp.int32)

    def make_scores_kernel(popcount):
        def kernel(q_ref, nvalid_ref, m_ref, out_ref):
            base_j = pl.program_id(0) * tile_j
            acc = jnp.zeros((8, tile_j), jnp.int32)
            for w in range(W):
                acc = acc + popcount(jnp.bitwise_and(m_ref[w], q_ref[0, w]))
            g = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + base_j
            col = g * np8 + jj
            out_ref[:] = jnp.where(
                col < nvalid_ref[0, 0], acc.astype(jnp.float32), NEG_INF
            )

        return kernel

    def and_floor_kernel(q_ref, nvalid_ref, m_ref, out_ref):
        # no popcount: AND + add only — DMA/issue floor for this layout
        acc = jnp.zeros((8, tile_j), jnp.int32)
        for w in range(W):
            acc = acc + jnp.bitwise_and(m_ref[w], q_ref[0, w]).astype(jnp.int32)
        out_ref[:] = acc.astype(jnp.float32)

    def scores_call(kernel_fn):
        grouped_spec = pl.BlockSpec(
            (W, 8, tile_j), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel_fn,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                grouped_spec,
            ],
            out_specs=[
                pl.BlockSpec((8, tile_j), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_shape=[jax.ShapeDtypeStruct((8, np8), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=3 * N * W, bytes_accessed=N * W * 4 + N * 4,
                transcendentals=0,
            ),
        )

    native_call = scores_call(make_scores_kernel(
        lambda x: jax.lax.population_count(x).astype(jnp.int32)))
    manual_call = scores_call(make_scores_kernel(_popcount_manual))
    floor_call = scores_call(and_floor_kernel)

    grouped = jnp.reshape(words_t, (W, 8, np8))
    nvalid_arr = jnp.reshape(n_valid, (1, 1))

    def chained(step, *consts):
        @jax.jit
        def run(qw, *cs):
            def body(carry, q):
                q = jnp.bitwise_xor(q, carry & jnp.uint32(0))  # couple
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

    # --- baselines: current extract kernel at k=20 and k=1
    for k in (20, 1):
        def step(q, g, nv):
            s, i = _binary_topk_q1(q[None, :], jnp.reshape(g, (W, N)), k,
                                   nv, BINARY_TILE_N)
            return q, (s, i)

        results[f"extract_k{k}"] = chained(step, grouped, n_valid)
        print(f"extract_k{k}: {results[f'extract_k{k}']:.3f} ms", flush=True)

    # --- scores-only kernels
    def mk_scores_step(call):
        def step(q, g, nv):
            scores = call(q[None, :], nv, g)[0]  # (8, np8)
            flat = jnp.reshape(scores, (1, N))   # flat idx == original col
            s, i = jax.lax.approx_max_k(flat, 64)
            return q, (s, i)

        return step

    results["scores_native"] = chained(mk_scores_step(native_call), grouped, nvalid_arr)
    print(f"scores_native(+approx64): {results['scores_native']:.3f} ms", flush=True)
    results["scores_manual"] = chained(mk_scores_step(manual_call), grouped, nvalid_arr)
    print(f"scores_manual(+approx64): {results['scores_manual']:.3f} ms", flush=True)

    # --- AND floor (no popcount, no shortlist)
    def floor_step(q, g, nv):
        s = floor_call(q[None, :], nv, g)[0]
        return q, jnp.sum(s[:, :8])

    results["and_floor"] = chained(floor_step, grouped, nvalid_arr)
    print(f"and_floor: {results['and_floor']:.3f} ms", flush=True)

    # --- cascade-shaped shortlist (depth 640)
    best = "manual" if results["scores_manual"] <= results["scores_native"] else "native"
    best_call = manual_call if best == "manual" else native_call

    def cascade_step(q, g, nv):
        scores = best_call(q[None, :], nv, g)[0]
        flat = jnp.reshape(scores, (1, N))
        s, i = jax.lax.approx_max_k(flat, 640)
        return q, (s, i)

    results["scores_approx640"] = chained(cascade_step, grouped, nvalid_arr)
    print(f"scores_{best}+approx640: {results['scores_approx640']:.3f} ms", flush=True)

    # --- current cascade prefilter path (XLA, depth 640)
    def xla_step(q, wt, nv):
        s, i = binary_topk_packed_t(q[None, :], wt, 640, n_valid=nv)
        return q, (s, i)

    results["xla_depth640"] = chained(xla_step, words_t, n_valid)
    print(f"xla_depth640: {results['xla_depth640']:.3f} ms", flush=True)

    # --- re-measure the baseline to bracket tunnel drift across the run
    def step20(q, g, nv):
        s, i = _binary_topk_q1(q[None, :], jnp.reshape(g, (W, N)), 20,
                               nv, BINARY_TILE_N)
        return q, (s, i)

    results["extract_k20_again"] = chained(step20, grouped, n_valid)
    print(f"extract_k20_again: {results['extract_k20_again']:.3f} ms", flush=True)

    # --- correctness spot-check: scores kernels agree with the XLA scores
    q0 = qwords[0][None, :]
    ref = np.asarray(
        jnp.sum(jax.lax.population_count(
            jnp.bitwise_and(q0[:, :, None], words_t[None, :, :])
        ).astype(jnp.int32), axis=1)
    )[0]
    for name, call in (("native", native_call), ("manual", manual_call)):
        got = np.asarray(call(q0, nvalid_arr, grouped)[0]).reshape(N)
        ok = np.array_equal(got.astype(np.int64), ref.astype(np.int64))
        print(f"scores_{name} exact vs XLA: {ok}", flush=True)
        results[f"exact_{name}"] = bool(ok)

    print("RESULTS", {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
