"""Probe 9: why did bench cascade_10m measure 11.7 ms where
probe_binary_10m's scores+approx path measured 2.4 ms?

Suspect: binary_shortlist_q1 reshapes words_t (W, N) -> grouped (W, 8, N/8)
INSIDE the jitted program; if XLA materializes that as a copy per scan step
(instead of a free bitcast / hoisted loop-invariant), the step pays a
~2.9 GB round trip on top of the scan. The probe passed the pre-grouped
array as the scan const, so it never paid it.

Variants at 10M rows (slope-fitted, chains 4/16):
  a) production binary_shortlist_q1(words_t)          [reshape inside]
  b) raw scores_call(grouped) + approx_max_k          [pre-grouped const]
  c) binary_scores_pallas(words_t) + approx_max_k     [reshape inside, no sort]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_shortlist_reshape.py
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

    from tpuclip.ops.hamming import (
        BINARY_TILE_N,
        binary_scores_pallas,
        binary_shortlist_q1,
        pack_bits_to_words,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    results = {}

    rng = np.random.default_rng(0)
    qbits = (rng.standard_normal((16, D)) >= 0).astype(np.uint8)
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

    def slope(tag, step_fn, carry_init, consts, chains=(4, 16)):
        try:
            w = {c: wall_p50(step_fn, carry_init, consts, c) for c in chains}
            c1, c2 = chains
            exec_ms = (w[c2] - w[c1]) / (c2 - c1)
            rpc_ms = w[c1] - c1 * exec_ms
            results[tag] = round(exec_ms, 3)
            print(f"{tag}: exec={exec_ms:.3f} ms/query rpc={rpc_ms:.1f} "
                  f"(walls c{c1}={w[c1]:.1f} c{c2}={w[c2]:.1f})", flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {str(e)[:150]}"
            print(f"{tag}: {results[tag]}", flush=True)

    n_rows = 10_000_000
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
    m = 1280

    def prod_step(carry, qw, wt, nv):
        qw = jnp.bitwise_xor(qw, (carry * 0.0).astype(jnp.uint32))
        s, i = binary_shortlist_q1(qw[None, :], wt, m, n_valid=nv)
        return jnp.max(s).astype(jnp.float32), (s, i)

    slope("a_shortlist_q1", prod_step, jnp.zeros((), jnp.float32),
          (words_t, n_valid))

    def scores_step(carry, qw, wt, nv):
        qw = jnp.bitwise_xor(qw, (carry * 0.0).astype(jnp.uint32))
        flat = binary_scores_pallas(qw[None, :], wt, n_valid=nv)
        s, i = jax.lax.approx_max_k(flat, m)
        return jnp.max(s).astype(jnp.float32), (s, i)

    slope("c_scores_approx", scores_step, jnp.zeros((), jnp.float32),
          (words_t, n_valid))

    # b) pre-grouped const: same kernel body but the reshape happens once,
    # outside the scan, at upload time
    grouped = jnp.reshape(words_t, (W, 8, n_pad // 8))
    grouped.block_until_ready()

    from tpuclip.ops import hamming as H
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np8 = n_pad // 8
    tile_j = BINARY_TILE_N // 8
    num_tiles = np8 // tile_j
    kernel = functools.partial(H._binary_scores_kernel, tile_j=tile_j, np8=np8)
    scores_call = pl.pallas_call(
        kernel,
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
    nvalid_arr = jnp.reshape(n_valid, (1, 1))

    def grouped_step(carry, qw, g, nv):
        qw = jnp.bitwise_xor(qw, (carry * 0.0).astype(jnp.uint32))
        flat = jnp.reshape(scores_call(qw[None, :], nv, g)[0], (1, n_pad))
        s, i = jax.lax.approx_max_k(flat, m)
        return jnp.max(s).astype(jnp.float32), (s, i)

    slope("b_pregrouped", grouped_step, jnp.zeros((), jnp.float32),
          (grouped, nvalid_arr))

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
