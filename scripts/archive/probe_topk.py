"""Decompose topk_pallas per-tile cost on the real chip.

Runs variants of the fused matmul+top-k kernel (tpuclip/ops/topk.py) that
strip one stage at a time, so the p50 budget can be attributed to
DMA stream vs MXU matmul vs VPU top-k extraction:

  stream   — DMA the matrix tiles through VMEM, 1-vreg reduce (HBM floor)
  matmul   — stream + (Qp,TILE) MXU scores, single max (no extraction)
  k1       — full kernel with k=1 (one extraction pass)
  full     — production kernel, k=20
  xla      — lax.top_k reference

Usage: python scripts/probe_topk.py [N]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuclip.ops.topk import DEFAULT_TILE_N, pad_matrix_t, topk_pallas, topk_xla

D = 1152
CHAIN = 32


def _stream_kernel(q_ref, m_ref, out_ref):
    # touch every element once; one vreg row of output broadcast to 8 sublanes
    s = jnp.sum(m_ref[:].astype(jnp.float32), axis=0, keepdims=True)[:, :128]
    out_ref[:] = jnp.broadcast_to(s, (8, 128)) + q_ref[0, 0].astype(jnp.float32)


def _matmul_kernel(q_ref, m_ref, out_ref):
    scores = jnp.dot(q_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.broadcast_to(jnp.max(scores, axis=1, keepdims=True), (8, 128))


def build_variant(kind, matrix, tile_n=DEFAULT_TILE_N):
    n = matrix.shape[1]
    num_tiles = n // tile_n
    qp = 8

    if kind == "stream":
        kern, out_w = _stream_kernel, 128
    elif kind == "matmul":
        kern, out_w = _matmul_kernel, 128
    else:
        raise ValueError(kind)

    @jax.jit
    def run(queries, matrix):
        return pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((qp, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qp, out_w), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((qp, num_tiles * out_w), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * qp * n * D,
                bytes_accessed=n * D * matrix.dtype.itemsize,
                transcendentals=0,
            ),
        )(queries, matrix)

    return run


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    return float(np.percentile(samples, 50))


def chained(fn_one, queries, matrix):
    @jax.jit
    def run(queries, matrix):
        def step(carry, q):
            q = q + carry * 0.0
            out = fn_one(q, matrix)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.max(leaf).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), queries)
        return c

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    host = rng.standard_normal((D, n)).astype(np.float32)
    padded, nv_int = pad_matrix_t(host)
    matrix = jnp.asarray(padded, dtype=dtype)
    nv = jnp.asarray(nv_int, jnp.int32)
    queries8 = jnp.asarray(
        rng.standard_normal((CHAIN, 8, D)).astype(np.float32), dtype=dtype
    )
    queries1 = queries8[:, :1]
    matrix.block_until_ready()

    n_pad = matrix.shape[1]
    gb = n_pad * D * matrix.dtype.itemsize / 1e9
    print(f"N={n} padded={n_pad} matrix={gb:.2f} GB backend={jax.default_backend()}")

    for kind in ("stream", "matmul"):
        fn = build_variant(kind, matrix)
        run = chained(fn, queries8, matrix)
        t = timeit(run, queries8, matrix) / CHAIN
        print(f"{kind:8s} {t*1e3:7.3f} ms  ({gb/t:.0f} GB/s)")

    for k in (1, 5, 20):
        fn = functools.partial(topk_pallas, k=k, n_valid=nv)
        run = chained(lambda q, m: fn(q, m), queries1, matrix)
        t = timeit(run, queries1, matrix) / CHAIN
        print(f"k={k:<6d} {t*1e3:7.3f} ms  ({gb/t:.0f} GB/s)")

    fn = functools.partial(topk_xla, k=20, n_valid=nv)
    run = chained(lambda q, m: fn(q, m), queries1, matrix)
    t = timeit(run, queries1, matrix) / CHAIN
    print(f"xla20    {t*1e3:7.3f} ms  ({gb/t:.0f} GB/s)")


if __name__ == "__main__":
    main()
