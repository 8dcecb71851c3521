"""Decompose the int8 fused-search cost on the real chip; test variants.

The production default search path (ops/topk_int8.topk_int8_rerank_fused)
spends its per-tile time in the VPU candidate extraction: the max-and-mask
loop runs ``k_tile`` (up to 80 at k=20) iterations per tile. This probe
times, at N=1M x D=1152:

  matmul    — int8 dot + single max per tile (DMA/MXU floor, no extraction)
  current   — pair-kernel _int8_candidates at k_tile=80 / 20
  packed    — the PRODUCTION packed-key kernel (_int8_candidates_packed):
              score truncated to its high 19 bits with (8191 - lane) in the
              low 13, so extraction needs one max-and-mask pass per
              candidate — the r3 default fused path.
  xla_topk  — int8 matmul materializing (Q, N) scores + lax.top_k
  approx    — int8 matmul + lax.approx_max_k (TPU PartialReduce)

The packed machinery is imported from ops/topk_int8.py — this probe
measures the very kernels production runs (an earlier copy here drifted
from the shipped code; review r3).

Usage: python scripts/probe_topk_int8.py [N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuclip.ops.topk_int8 import (
    _IDX_MASK,
    INT8_TILE_N,
    _int8_candidates,
    _int8_candidates_packed,
)

D = 1152
CHAIN = 16
NEG_INF = float("-inf")


def unpack_topk(keys, m, k_pad, tile_n):
    """Global top-m over packed keys -> global row indices (same unpack as
    the fused path in ops/topk_int8.py)."""
    top_keys, pos = jax.lax.top_k(keys, m)
    u = jax.lax.bitcast_convert_type(top_keys, jnp.uint32) ^ jnp.uint32(0x80000000)
    local = jnp.uint32(_IDX_MASK) - (u & jnp.uint32(_IDX_MASK))
    tile = pos // k_pad
    return tile * tile_n + local.astype(jnp.int32)


def _matmul_only_kernel(q_ref, m_ref, scales_ref, meta_ref, out_ref):
    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = acc[:8].astype(jnp.float32) * scales_ref[0, :][None, :]
    out_ref[:] = jnp.max(s, axis=1, keepdims=True) * jnp.ones((8, 128), jnp.float32)


def matmul_only(q_int8, matrix_int8_t, scales, n_valid, tile_n=INT8_TILE_N):
    q_count, d = q_int8.shape
    n = matrix_int8_t.shape[1]
    num_tiles = n // tile_n
    q_pad = (-q_count) % 32
    if q_pad:
        q_int8 = jnp.pad(q_int8, ((0, q_pad), (0, 0)))
    qp = q_int8.shape[0]
    out = pl.pallas_call(
        _matmul_only_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_shape=[jax.ShapeDtypeStruct((8, num_tiles * 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d, bytes_accessed=n * d + qp * d + n * 4,
            transcendentals=0,
        ),
    )(q_int8, matrix_int8_t, scales.reshape(1, -1),
      jnp.reshape(n_valid.astype(jnp.int32), (1, 1)))[0]
    return out


def timeit_chained(make_step, queries, consts, reps=5):
    @jax.jit
    def chained(queries, *consts):
        def body(carry, q):
            return make_step(carry, q, *consts)
        _, outs = jax.lax.scan(body, jnp.zeros((), jnp.float32), queries)
        return outs

    out = chained(queries, *consts)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(queries, *consts)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / queries.shape[0])
    return float(np.percentile(times, 50) * 1000)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = 20
    n_pad = -(-n // INT8_TILE_N) * INT8_TILE_N
    print(f"backend={jax.default_backend()} n={n} n_pad={n_pad} k={k}", flush=True)

    @jax.jit
    def gen(seed):
        m = jax.random.normal(jax.random.PRNGKey(seed), (D, n_pad), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        m = jnp.where(col < n, m, 0)
        scales = jnp.max(jnp.abs(m), axis=0) / 127.0
        scales = jnp.where(scales == 0, 1.0, scales)
        mq = jnp.clip(jnp.round(m / scales[None, :]), -127, 127).astype(jnp.int8)
        return mq, scales

    mq, scales = gen(0)
    jax.block_until_ready(mq)
    nv = jnp.asarray(n, jnp.int32)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(
        np.clip(np.rint(rng.standard_normal((CHAIN, 1, D)) * 40), -127, 127
                ).astype(np.int8)
    )
    print("device data ready", flush=True)

    def step_matmul(carry, q, mq, scales, nv):
        q = (q.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(jnp.int8)
        out = matmul_only(q, mq, scales, nv)
        return jnp.max(out), out[:, :128]

    def make_step_current(k_tile):
        def step(carry, q, mq, scales, nv):
            q = (q.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(jnp.int8)
            s, i = _int8_candidates(q, mq, scales, k_tile, nv, INT8_TILE_N, False)
            return jnp.max(s), (s[:, :128], i[:, :128])
        return step

    def make_step_packed(k_tile):
        k_pad = -(-k_tile // 128) * 128
        def step(carry, q, mq, scales, nv):
            q = (q.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(jnp.int8)
            keys = _int8_candidates_packed(
                q, mq, scales, k_tile, nv, INT8_TILE_N, False
            )[:1]
            rows = unpack_topk(keys, 512, k_pad, INT8_TILE_N)
            return jnp.max(keys).astype(jnp.float32), rows
        return step

    def step_xla(carry, q, mq, scales, nv):
        q = (q.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, mq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * scales[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = jnp.where(col < nv, s, NEG_INF)
        ts, ti = jax.lax.top_k(s, 512)
        return jnp.max(ts), (ts[:, :128], ti[:, :128])

    def step_approx(carry, q, mq, scales, nv):
        q = (q.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, mq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * scales[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = jnp.where(col < nv, s, NEG_INF)
        ts, ti = jax.lax.approx_max_k(s, 512, recall_target=0.99)
        return jnp.max(ts), (ts[:, :128], ti[:, :128])

    consts = (mq, scales, nv)
    for name, step in [
        ("matmul_floor", step_matmul),
        ("current_k80", make_step_current(80)),
        ("current_k20", make_step_current(20)),
        ("packed_k80", make_step_packed(80)),
        ("packed_k20", make_step_packed(20)),
        ("xla_topk512", step_xla),
        ("approx512", step_approx),
    ]:
        try:
            ms = timeit_chained(step, qs, consts)
            print(f"{name:14s} {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} ERROR {str(e)[:160]}", flush=True)

    # correctness spot-check of the packed variant vs current candidates
    q1 = qs[0]
    keys = _int8_candidates_packed(q1, mq, scales, 80, nv, INT8_TILE_N, False)[:1]
    rows_packed = np.asarray(unpack_topk(keys, 512, 128, INT8_TILE_N))[0]
    s_cur, i_cur = _int8_candidates(q1, mq, scales, 80, nv, INT8_TILE_N, False)
    ts, pos = jax.lax.top_k(s_cur[:1], 512)
    rows_cur = np.asarray(jnp.take_along_axis(i_cur[:1], pos, axis=1))[0]
    overlap = len(set(rows_packed.tolist()) & set(rows_cur.tolist())) / 512
    print(f"packed vs current shortlist overlap@512: {overlap:.4f}", flush=True)


if __name__ == "__main__":
    main()
