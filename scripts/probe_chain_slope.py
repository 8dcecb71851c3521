"""Probe 6: separate true device-exec time from tunnel RPC by chain-length
slope fitting.

probe_dispatch_overhead.py proved the chained protocol's wall time is
    wall(c) = RPC + c * exec        (RPC ~ 25-45 ms, tunnel round trip)
— a NO-OP scan step measures 2.5-3.1 "ms/step" at c=16, purely RPC/16.
Every latency the bench has ever recorded is exec + RPC/chain, i.e.
inflated by ~0.6-2 ms. This probe measures each production program at two
chain lengths and reports the slope (device exec per query) and intercept
(RPC) separately:

  noop          sanity: slope ~0, intercept ~RPC
  int8_fused    production headline (scores+verified+rescore, k=20, 1M)
  int8_extract  the in-kernel extract program (batch default/fallback)
  bf16_scan     r1/r2 continuity basis
  bin_extract   packed-binary grouped q1 kernel, k=20
  bin_xla640    current cascade prefilter (XLA, depth 640)
  bin_scores640 grouped scores kernel + approx_max_k(640) [candidate]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_chain_slope.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

N = 1 << 20
D = 1152
W = D // 32
CHAINS = (8, 64)
SAMPLES = 5
K = 20


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
        pack_bits_to_words_device,
    )
    from tpuclip.ops.topk import topk_pallas
    from tpuclip.ops.topk_int8 import INT8_TILE_N, topk_int8_rerank_fused

    print(f"backend={jax.default_backend()} N={N}", flush=True)

    # ---------------- device data prep (one jitted program) ----------------
    n_pad = -(-N // INT8_TILE_N) * INT8_TILE_N

    @jax.jit
    def gen(seed):
        m = jax.random.normal(jax.random.PRNGKey(seed), (D, n_pad), jnp.bfloat16)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        m = jnp.where(col < N, m, 0)
        mf = m.astype(jnp.float32)
        scales = jnp.max(jnp.abs(mf), axis=0) / 127.0
        scales = jnp.where(scales == 0, 1.0, scales)
        mq = jnp.clip(jnp.round(mf / scales[None, :]), -127, 127).astype(jnp.int8)
        rows = m[:, :N].T
        bits = (mf[:, :N] >= 0).T.astype(jnp.uint8)
        words = pack_bits_to_words_device(bits)  # (N, W)
        words_t = words.T  # (W, N); N is already a BINARY_TILE_N multiple
        return m, mq, scales, rows, words_t

    matrix, mq, scales, rows, words_t = gen(0)
    jax.block_until_ready((matrix, mq, scales, rows, words_t))
    n_valid = jnp.asarray(N, jnp.int32)
    print("device prep done", flush=True)

    rng = np.random.default_rng(0)
    cmax = max(CHAINS)
    qf32 = jnp.asarray(rng.standard_normal((cmax, 1, D), dtype=np.float32))
    qbits = (rng.standard_normal((cmax, D)) >= 0).astype(np.uint8)
    qwords_all = jnp.asarray(pack_bits_to_words(qbits))

    def wall_p50(step_fn, inputs_full, carry_init, consts, chain):
        inputs = jax.tree_util.tree_map(lambda x: x[:chain], inputs_full)

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

    results = {}

    def slope(tag, step_fn, inputs_full, carry_init, consts):
        try:
            w = {c: wall_p50(step_fn, inputs_full, carry_init, consts, c)
                 for c in CHAINS}
            c1, c2 = CHAINS
            exec_ms = (w[c2] - w[c1]) / (c2 - c1)
            rpc_ms = w[c1] - c1 * exec_ms
            results[tag] = {"exec_ms": round(exec_ms, 3),
                            "rpc_ms": round(rpc_ms, 2),
                            **{f"wall_c{c}": round(v, 2) for c, v in w.items()}}
            print(f"{tag}: exec={exec_ms:.3f} ms/query rpc={rpc_ms:.1f} ms "
                  f"(walls {w})", flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {str(e)[:150]}"
            print(f"{tag}: {results[tag]}", flush=True)

    # ---------------- noop ----------------
    def noop_step(carry, q):
        return carry, jnp.sum(q)

    slope("noop", noop_step, qf32, jnp.zeros((), jnp.float32), ())

    # ---------------- int8 fused (verified = production headline) ----------
    def fused_step(method):
        def step(carry, q, mq, scales, rows, nv):
            q = q + carry * 0.0
            out = topk_int8_rerank_fused(
                q, mq, scales, rows, K, n_valid=nv, use_pallas=True,
                shortlist_method=method,
            )
            return jnp.max(out[0]), out

        return step

    slope("int8_fused_verified", fused_step("verified"), qf32,
          jnp.zeros((), jnp.float32), (mq, scales, rows, n_valid))
    slope("int8_fused_extract", fused_step("extract"), qf32,
          jnp.zeros((), jnp.float32), (mq, scales, rows, n_valid))

    # ---------------- bf16 full scan ----------------
    def bf16_step(carry, q, m, nv):
        q = (q + carry * 0.0).astype(m.dtype)
        s, i = topk_pallas(q, m, K, n_valid=nv)
        return jnp.max(s).astype(jnp.float32), (s, i)

    slope("bf16_scan", bf16_step, qf32, jnp.zeros((), jnp.float32),
          (matrix, n_valid))

    # ---------------- binary extract q1 ----------------
    def bin_step(carry, qw, wt, nv):
        qw = jnp.bitwise_xor(qw, carry & jnp.uint32(0))
        s, i = _binary_topk_q1(qw[None, :], wt, K, nv, BINARY_TILE_N)
        return qw, (s, i)

    slope("bin_extract_k20", bin_step, qwords_all,
          jnp.zeros((W,), jnp.uint32), (words_t, n_valid))

    # ---------------- binary XLA depth 640 (current cascade) ----------------
    def bin_xla_step(carry, qw, wt, nv):
        qw = jnp.bitwise_xor(qw, carry & jnp.uint32(0))
        s, i = binary_topk_packed_t(qw[None, :], wt, 640, n_valid=nv)
        return qw, (s, i)

    slope("bin_xla640", bin_xla_step, qwords_all,
          jnp.zeros((W,), jnp.uint32), (words_t, n_valid))

    # ---------------- binary scores kernel + approx(640) ----------------
    np8 = N // 8
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

    def bin_scores_step(carry, qw, g, nv):
        qw = jnp.bitwise_xor(qw, carry & jnp.uint32(0))
        flat = jnp.reshape(scores_call(qw[None, :], nv, g)[0], (1, N))
        s, i = jax.lax.approx_max_k(flat, 640)
        return qw, (s, i)

    slope("bin_scores640", bin_scores_step, qwords_all,
          jnp.zeros((W,), jnp.uint32), (grouped, nvalid_arr))

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
