"""Probe 5: is there a fixed per-invocation overhead inside chained-scan
measurements on this backend?

probe_binary_tall.py's calibration: the SAME int8 matmul kernel measures
460 GB/s effective on a 1.15 GB matrix but only 89 GB/s on a 156 MB one.
Two-point fit: time ~= F + bytes/819GB/s with F ~= 1.2-2 ms — i.e. the
chained protocol may charge every step a fixed dispatch cost that
dominates small-array kernels (the whole binary tier reads only 144 MB).

Variants:
  noop_pallas   chained scan of a (8, 256)-read pallas kernel
                -> per-step time ~= pure pallas per-invocation overhead
  noop_xla      chained scan of a tiny XLA elementwise op
                -> is the overhead pallas-specific or backend-wide?
  grid16        ONE pallas invocation whose grid sweeps the 144 MB binary
                matrix 16 times (same total bytes as 16 chained steps)
                -> per-sweep time without per-invocation overhead
  chain16       the standard chained version of the same kernel (control)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dispatch_overhead.py
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
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def make_words(key):
        return jax.random.randint(
            key, (W, N), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        ).astype(jnp.uint32)

    words_t = make_words(jax.random.PRNGKey(0))
    words_t.block_until_ready()
    qwords = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, (CHAIN, W), dtype=np.uint32)
    )

    results = {}

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

    # ---- noop pallas: reads one (8, 256) block, q-dependent ----
    tiny = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)

    def noop_kern(q_ref, m_ref, out_ref):
        out_ref[:] = m_ref[:] + q_ref[0, 0].astype(jnp.int32)

    noop_call = pl.pallas_call(
        noop_kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, 256), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.int32)],
    )

    def noop_step(q, m):
        out = noop_call(q[None, :], m)[0]
        return q, out[:1, :8]

    results["noop_pallas_ms"] = round(chained(noop_step, tiny), 3)
    print(f"noop_pallas: {results['noop_pallas_ms']} ms/step", flush=True)

    # ---- noop XLA ----
    def noop_xla_step(q, m):
        out = m + q[0].astype(jnp.int32)
        return q, out[:1, :8]

    results["noop_xla_ms"] = round(chained(noop_xla_step, tiny), 3)
    print(f"noop_xla: {results['noop_xla_ms']} ms/step", flush=True)

    # ---- the binary floor kernel: chained (control) vs 16x-grid ----
    tile = 16384
    num_tiles = N // tile

    def floor_kern(q_ref, m_ref, out_ref):
        acc = jnp.zeros((1, tile), jnp.int32)
        for w in range(W):
            acc = acc + jax.lax.population_count(
                jnp.bitwise_and(m_ref[w:w + 1, :], q_ref[0, w])
            ).astype(jnp.int32)
        out_ref[:] = acc

    chain_call = pl.pallas_call(
        floor_kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.int32)],
    )

    def chain_step(q, m):
        out = chain_call(q[None, :], m)[0]
        return q, out[:1, :8]

    results["chain16_ms"] = round(chained(chain_step, words_t), 3)
    print(f"chain16: {results['chain16_ms']} ms/step = "
          f"{MB/results['chain16_ms']:.0f} GB/s", flush=True)

    # one invocation, grid sweeps the matrix CHAIN times; the q for sweep s
    # comes from an SMEM (CHAIN, W) table so sweeps differ (anti-hoisting
    # isn't needed inside one program, but keep the work identical)
    def grid_kern(qtab_ref, m_ref, out_ref):
        s = pl.program_id(0) // num_tiles
        acc = jnp.zeros((1, tile), jnp.int32)
        for w in range(W):
            acc = acc + jax.lax.population_count(
                jnp.bitwise_and(m_ref[w:w + 1, :], qtab_ref[s, w])
            ).astype(jnp.int32)
        out_ref[:] = acc

    grid_call = pl.pallas_call(
        grid_kern,
        grid=(CHAIN * num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W, tile), lambda i: (0, i % num_tiles),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i % num_tiles),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.int32)],
    )

    @jax.jit
    def run_grid(qtab, m):
        return grid_call(qtab, m)[0]

    out = run_grid(qwords, words_t)
    _ = np.asarray(out[:1, :8])
    times = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        out = run_grid(qwords, words_t)
        _ = np.asarray(out[:1, :8])
        times.append((time.perf_counter() - t0) / CHAIN)
    results["grid16_ms"] = round(float(np.percentile(times, 50) * 1000), 3)
    print(f"grid16: {results['grid16_ms']} ms/sweep = "
          f"{MB/results['grid16_ms']:.0f} GB/s "
          f"(one invocation, {CHAIN}x{num_tiles} grid)", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
