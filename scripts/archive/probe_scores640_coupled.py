"""Probe 7: re-measure the binary scores+approx(640) candidate with a
NON-FOLDABLE loop coupling, plus a shortlist-content check.

probe_chain_slope.py read bin_scores640 at 0.008 ms/query — an artifact:
the uint32 coupling `xor(q, carry & 0)` constant-folds (unlike the float
`q + carry*0.0` trick, which survives because 0*NaN != 0), leaving the
scan body with no loop-carried dependency; the backend then evidently
collapsed the 64 iterations (both chain lengths walled at ~48 ms).
Here the carry is the previous iteration's top SCORE (f32), coupled via
`xor(q, (s*0).astype(uint32))` — not foldable. bin_xla640 is re-measured
under the identical coupling for a fair slope comparison.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_scores640_coupled.py
"""

from __future__ import annotations

import time

import numpy as np

N = 1 << 20
D = 1152
W = D // 32
CHAINS = (8, 64)
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
        pack_bits_to_words_device,
    )

    print(f"backend={jax.default_backend()} N={N}", flush=True)

    @jax.jit
    def gen(seed):
        m = jax.random.normal(jax.random.PRNGKey(seed), (256, N), jnp.float32)
        bits = jnp.concatenate([m >= 0] * (D // 256 + 1), axis=0)[:D].T
        words = pack_bits_to_words_device(bits.astype(jnp.uint8))
        return words.T  # (W, N)

    words_t = gen(0)
    words_t.block_until_ready()
    n_valid = jnp.asarray(N, jnp.int32)

    rng = np.random.default_rng(0)
    cmax = max(CHAINS)
    qbits = (rng.standard_normal((cmax, D)) >= 0).astype(np.uint8)
    qwords_all = jnp.asarray(pack_bits_to_words(qbits))

    results = {}

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

    def slope(tag, step_fn, inputs_full, carry_init, consts):
        w = {c: wall_p50(step_fn, inputs_full, carry_init, consts, c)
             for c in CHAINS}
        c1, c2 = CHAINS
        exec_ms = (w[c2] - w[c1]) / (c2 - c1)
        rpc_ms = w[c1] - c1 * exec_ms
        results[tag] = {"exec_ms": round(exec_ms, 3), "rpc_ms": round(rpc_ms, 2)}
        print(f"{tag}: exec={exec_ms:.3f} ms/query rpc={rpc_ms:.1f} ms "
              f"(walls c{c1}={w[c1]:.1f} c{c2}={w[c2]:.1f})", flush=True)

    # shared scores kernel (grouped q1 layout)
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

    def couple(qw, s_carry):
        # s_carry*0 is NOT foldable (f32: 0*NaN != 0), so the cast result
        # chains this iteration's query to the previous iteration's output
        return jnp.bitwise_xor(qw, (s_carry * 0.0).astype(jnp.uint32))

    def scores_step(carry, qw, g, nv):
        qw = couple(qw, carry)
        flat = jnp.reshape(scores_call(qw[None, :], nv, g)[0], (1, N))
        s, i = jax.lax.approx_max_k(flat, 640)
        return s[0, 0], (s, i)

    slope("bin_scores640_coupled", scores_step, qwords_all,
          jnp.zeros((), jnp.float32), (grouped, nvalid_arr))

    def xla_step(carry, qw, wt, nv):
        qw = couple(qw, carry)
        s, i = binary_topk_packed_t(qw[None, :], wt, 640, n_valid=nv)
        return s[0, 0].astype(jnp.float32), (s, i)

    slope("bin_xla640_coupled", xla_step, qwords_all,
          jnp.zeros((), jnp.float32), (words_t, n_valid))

    def extract_step(carry, qw, wt, nv):
        qw = couple(qw, carry)
        s, i = _binary_topk_q1(qw[None, :], wt, 20, nv, BINARY_TILE_N)
        return s[0, 0].astype(jnp.float32), (s, i)

    slope("bin_extract20_coupled", extract_step, qwords_all,
          jnp.zeros((), jnp.float32), (words_t, n_valid))

    # ---- shortlist content check: scores+approx vs exact top-640 ----
    q0 = qwords_all[:1]
    flat = jnp.reshape(scores_call(q0, nvalid_arr, grouped)[0], (1, N))
    s_a, i_a = jax.lax.approx_max_k(flat, 640)
    s_x, i_x = binary_topk_packed_t(q0, words_t, 640, n_valid=n_valid)
    sa, ia = np.asarray(s_a[0]), np.asarray(i_a[0])
    sx, ix = np.asarray(s_x[0]), np.asarray(i_x[0])
    # tie-robust comparison: count of shortlist entries with score
    # STRICTLY above the exact path's 640th score (must match exactly),
    # plus raw index overlap for color
    t = sx.min()
    above_exact = int((sx > t).sum())
    above_approx = int((sa > t).sum())
    overlap = len(np.intersect1d(ia, ix)) / 640.0
    results["above_t_exact"] = above_exact
    results["above_t_approx"] = above_approx
    results["index_overlap"] = round(overlap, 4)
    print(f"shortlist: above-t exact={above_exact} approx={above_approx} "
          f"index-overlap={overlap:.4f}", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
