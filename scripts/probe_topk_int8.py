"""Decompose the int8 fused-search cost on the real chip; test variants.

The production default search path (ops/topk_int8.topk_int8_rerank_fused)
spends its per-tile time in the VPU candidate extraction: the max-and-mask
loop runs ``k_tile`` (up to 80 at k=20) iterations per tile, each costing a
lane max-reduce, an index-locate pass, and a mask pass over the (8, TILE)
score block. This probe times, at N=1M x D=1152:

  matmul    — int8 dot + single max per tile (DMA/MXU floor, no extraction)
  current   — production _int8_candidates at k_tile=80 (fused-path depth)
  k20       — _int8_candidates at k_tile=20 (plain int8-path depth)
  packed    — PACKED-KEY variant: truncate the f32 score to its high 19
              bits and OR (8191 - lane_idx) into the low 13, giving unique
              monotonic int32 keys — extraction then needs only max-reduce
              + mask per iteration (the index rides inside the key), ~2x
              fewer VPU passes; exactness is unchanged for the FUSED path
              because scores are rescored exactly afterwards and the
              truncation (2^-11 relative) is far below the int8
              quantization noise (~1e-3) already present in shortlist
              selection.
  xla_topk  — int8 matmul materializing (Q, N) scores + lax.top_k
  approx    — int8 matmul + lax.approx_max_k (TPU PartialReduce)

Usage: python scripts/probe_topk_int8.py [N]
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

from tpuclip.ops.topk_int8 import INT8_TILE_N, _int8_candidates

D = 1152
CHAIN = 16
NEG_INF = float("-inf")
IDX_BITS = 13  # 8192 >= INT8_TILE_N + 1 guard; tile must fit
IDX_MASK = (1 << IDX_BITS) - 1


def _pack_keys(scores: jnp.ndarray) -> jnp.ndarray:
    """f32 scores -> monotonic int32 keys with lane index in the low bits.

    Unsigned-monotonic float mapping (sign-flip trick), truncate low
    IDX_BITS, OR in (IDX_MASK - lane) so ties break to the LOWEST index,
    then bias to signed so jnp.max works."""
    u = jax.lax.bitcast_convert_type(scores, jnp.uint32)
    flip = jnp.where(
        (u >> 31) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    u = u ^ flip
    lane = jax.lax.broadcasted_iota(jnp.uint32, scores.shape, 1) & jnp.uint32(IDX_MASK)
    key = (u & jnp.uint32(~IDX_MASK & 0xFFFFFFFF)) | (jnp.uint32(IDX_MASK) - lane)
    return jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000), jnp.int32)


def _packed_kernel(q_ref, m_ref, scales_ref, meta_ref, keys_ref, *, k, k_pad, tile_n, out_rows):
    base = pl.program_id(0) * tile_n
    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc[:out_rows].astype(jnp.float32) * scales_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < meta_ref[0, 0], scores, NEG_INF)
    ki = _pack_keys(scores)
    outs = []
    for _ in range(k):
        best = jnp.max(ki, axis=1)
        outs.append(best)
        ki = jnp.where(ki == best[:, None], jnp.iinfo(jnp.int32).min, ki)
    out = jnp.stack(outs, axis=1)
    if k_pad > k:
        out = jnp.pad(out, ((0, 0), (0, k_pad - k)),
                      constant_values=jnp.iinfo(jnp.int32).min)
    keys_ref[:] = out


def packed_candidates(q_int8, matrix_int8_t, scales, k_tile, n_valid, tile_n=INT8_TILE_N):
    q_count, d = q_int8.shape
    n = matrix_int8_t.shape[1]
    num_tiles = n // tile_n
    q_pad = (-q_count) % 32
    if q_pad:
        q_int8 = jnp.pad(q_int8, ((0, q_pad), (0, 0)))
    qp = q_int8.shape[0]
    out_rows = min(qp, max(8, -(-q_count // 8) * 8))
    k_pad = -(-k_tile // 128) * 128
    kernel = functools.partial(
        _packed_kernel, k=k_tile, k_pad=k_pad, tile_n=tile_n, out_rows=out_rows
    )
    keys = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_rows, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, num_tiles * k_pad), jnp.int32)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d + qp * d + n * 4,
            transcendentals=0,
        ),
    )(q_int8, matrix_int8_t, scales.reshape(1, -1),
      jnp.reshape(n_valid.astype(jnp.int32), (1, 1)))[0]
    return keys[:q_count]


def unpack_topk(keys, m, k_pad, tile_n):
    """Global top-m over packed keys -> (tile-local) global row indices."""
    top_keys, pos = jax.lax.top_k(keys, m)
    u = jax.lax.bitcast_convert_type(top_keys, jnp.uint32) ^ jnp.uint32(0x80000000)
    local = jnp.uint32(IDX_MASK) - (u & jnp.uint32(IDX_MASK))
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
            keys = packed_candidates(q, mq, scales, k_tile, nv)
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
    keys = packed_candidates(q1, mq, scales, 80, nv)
    rows_packed = np.asarray(unpack_topk(keys, 512, 128, INT8_TILE_N))[0]
    s_cur, i_cur = _int8_candidates(q1, mq, scales, 80, nv, INT8_TILE_N, False)
    ts, pos = jax.lax.top_k(s_cur[:1], 512)
    rows_cur = np.asarray(jnp.take_along_axis(i_cur[:1], pos, axis=1))[0]
    overlap = len(set(rows_packed.tolist()) & set(rows_cur.tolist())) / 512
    print(f"packed vs current shortlist overlap@512: {overlap:.4f}", flush=True)


if __name__ == "__main__":
    main()
