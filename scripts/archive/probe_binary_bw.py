"""Probe 3: WHY does every packed-binary kernel variant read at ~60 GB/s
when the int8 matmul kernel reads the same HBM at ~460 GB/s?

probe_binary_scores.py eliminated popcount + extraction (AND-only floor =
2.4 ms); probe_binary_layout.py eliminated block layout + tile size
(grouped / tile-contiguous / 16k / 64k all ~2.6 ms). Remaining suspects:
the container SHAPE (W=36 second-minor dim) and the DTYPE (uint32).

All variants read the same 144 MB (1M x 1152 bits) through a load-only
kernel (sublane-sum, trivial VPU), chained protocol:

  u32_2d      (36, N) uint32, block (36, 16k)      [current container]
  u32_pad40   (40, N) uint32, block (40, 16k)      [8-aligned sublanes]
  f32_2d      (36, N) float32 bitcast               [dtype test]
  i8_2d       (144, N) int8 bitcast, block (144, 16k)  [int8 container]
  bf16_2d     (72, N) bf16 bitcast                  [16-sublane dtype]
  xla_reduce  jnp popcount-sum over (36, N) uint32  [XLA's own BW]
  int8_mm     int8_scores_pallas on (1152, N/8) int8 = 151 MB [calibration:
               the known-fast shape measured ~460 GB/s in bench]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_binary_bw.py
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

    print(f"backend={jax.default_backend()} N={N} bytes={W*N*4/1e6:.0f}MB",
          flush=True)

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
    MB = W * N * 4 / 1e6

    def report(tag, ms):
        results[tag] = round(ms, 3)
        print(f"{tag}: {ms:.3f} ms = {MB/ms:.0f} GB/s", flush=True)

    # ---- generic load-floor kernel over a 2D container ----
    def floor_2d(arr, rows, tile, acc_dtype=jnp.int32, cp=None):
        num_tiles = arr.shape[1] // tile

        def kern(m_ref, out_ref):
            x = m_ref[:]
            if x.dtype in (jnp.uint32, jnp.int8, jnp.uint8):
                x = x.astype(jnp.int32)
            elif x.dtype == jnp.bfloat16:
                x = x.astype(jnp.float32)
            out_ref[:] = jnp.sum(x, axis=0, keepdims=True).astype(out_ref.dtype)

        out_dtype = jnp.float32 if arr.dtype in (jnp.float32, jnp.bfloat16) else jnp.int32
        call = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec((rows, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, arr.shape[1]), out_dtype)],
            compiler_params=cp,
        )

        def step(q, a):
            out = call(a)[0]
            return q, out[0, :8]

        return step

    # u32_2d: the current container
    report("u32_2d", chained(floor_2d(words_t, W, 16384), words_t))

    # u32_pad40: 8-aligned sublane count
    words_pad = jnp.concatenate(
        [words_t, jnp.zeros((4, N), jnp.uint32)], axis=0)
    words_pad.block_until_ready()
    report("u32_pad40", chained(floor_2d(words_pad, 40, 16384), words_pad))

    # f32 bitcast
    @jax.jit
    def as_f32(w):
        return jax.lax.bitcast_convert_type(w, jnp.float32)

    wf32 = as_f32(words_t)
    wf32.block_until_ready()

    def floor_f32(arr, rows, tile):
        num_tiles = arr.shape[1] // tile

        def kern(m_ref, out_ref):
            out_ref[:] = jnp.sum(m_ref[:] * 0.0, axis=0, keepdims=True)

        call = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec((rows, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, arr.shape[1]), jnp.float32)],
        )

        def step(q, a):
            out = call(a)[0]
            return q, out[0, :8]

        return step

    report("f32_2d", chained(floor_f32(wf32, W, 16384), wf32))

    # int8 container: (4W, N) via byte bitcast — reshape (W,N) u32 -> bytes.
    @jax.jit
    def as_i8(w):
        b = jax.lax.bitcast_convert_type(w, jnp.uint8)  # (W, N, 4)
        return jnp.transpose(b, (0, 2, 1)).reshape(4 * W, N).astype(jnp.int8)

    wi8 = as_i8(words_t)
    wi8.block_until_ready()
    report("i8_2d", chained(floor_2d(wi8, 4 * W, 16384), wi8))

    # bf16 container: (2W, N)
    @jax.jit
    def as_bf16(w):
        b = jax.lax.bitcast_convert_type(w, jnp.bfloat16)  # (W, N, 2)
        return jnp.transpose(b, (0, 2, 1)).reshape(2 * W, N)

    wbf = as_bf16(words_t)
    wbf.block_until_ready()
    report("bf16_2d", chained(floor_2d(wbf, 2 * W, 16384), wbf))

    # XLA's own read of the uint32 container
    def xla_step(q, w):
        s = jnp.sum(jax.lax.population_count(
            jnp.bitwise_and(w, q[:, None])).astype(jnp.int32))
        return q, s

    report("xla_reduce", chained(xla_step, words_t))

    # calibration: the int8 matmul kernel's known-fast shape, same era/run
    from tpuclip.ops.topk_int8 import int8_scores_pallas

    n8 = N // 8  # 131072 cols x 1152 rows int8 = 151 MB
    @jax.jit
    def make_i8mat(key):
        return jax.random.randint(key, (D, n8), -127, 127, jnp.int8)

    mat8 = make_i8mat(jax.random.PRNGKey(1))
    mat8.block_until_ready()
    scales = jnp.ones((n8,), jnp.float32)
    nv = jnp.asarray(n8, jnp.int32)
    q8 = jnp.asarray(
        np.random.default_rng(2).integers(-127, 127, (CHAIN, 1, D), np.int8))

    def mm_step(q, m, s, v):
        sc = int8_scores_pallas(q[0] + (q[0] & 0), m, s, v)
        return q, sc[:, :8]

    @jax.jit
    def run_mm(qs, m, s, v):
        def body(carry, q):
            q = q + (carry & 0)
            sc = int8_scores_pallas(q, m, s, v)
            return sc[:1, :1].astype(jnp.int8) * 0 + carry * 0, sc[:, :8]

        _, outs = jax.lax.scan(body, jnp.zeros((1, 1), jnp.int8), qs)
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

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
