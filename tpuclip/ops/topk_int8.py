"""int8 quantized fused search.

The bf16 scan is HBM-bandwidth-bound (the matrix is read once per query), so
halving bytes halves latency: vectors quantize to symmetric per-vector int8
(unit-norm rows → scales are near-uniform), the MXU computes exact int32
dots, and scores rescale in fp32. Measured ranking agreement with the bf16
scan is validated in tests (top-k recall on random unit vectors). Combined
with the fused exact rescore (:func:`topk_int8_rerank_fused`) this is the
DEFAULT search path on TPU (results bit-equal to the bf16 scan, ~1.5x
faster); `TPUCLIP_SEARCH_PRECISION=bf16` restores the plain full scan.

Layout matches tpuclip.ops.topk: matrix transposed (D, N), padded columns,
n_valid masking, (score desc, idx asc) ordering.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuclip.ops.topk import _final_merge

_NEG_INF = float("-inf")


def round_f32_to_bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Round float32 to the nearest bfloat16 value, returned AS float32,
    via integer bit manipulation (round-half-to-even).

    ``x.astype(bf16).astype(f32)`` is NOT equivalent under jit: XLA's
    excess-precision rule elides a downcast that only feeds an upcast (or a
    dot's internal f32 upcast), silently substituting the unrounded input.
    When a computation must use exactly the bf16-rounded value — e.g. the
    fused-rerank rescore reproducing the bf16 scan's scores — the rounding
    has to be expressed as integer arithmetic XLA cannot fold away.
    Finite inputs only (queries here are finite by construction)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lsb = (u >> 16) & jnp.uint32(1)
    u = u + jnp.uint32(0x7FFF) + lsb
    u = u & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def quantize_matrix_t(matrix_t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(D, N) float → (int8 (D, N), scales (N,) float32), symmetric per-column."""
    m = np.asarray(matrix_t, np.float32)
    scales = np.abs(m).max(axis=0) / 127.0
    scales = np.where(scales == 0, 1.0, scales).astype(np.float32)
    q = np.clip(np.rint(m / scales[None, :]), -127, 127).astype(np.int8)
    return q, scales


def quantize_query(q: np.ndarray) -> Tuple[np.ndarray, float]:
    q = np.asarray(q, np.float32)
    scale = float(np.abs(q).max() / 127.0) or 1.0
    qi = np.clip(np.rint(q / scale), -127, 127).astype(np.int8)
    return qi, scale


@functools.partial(jax.jit, static_argnames=("n_pad",))
def derive_int8_matrix_device(
    rows: jnp.ndarray, n_pad: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Derive the transposed int8 scan matrix + per-vector scales ON DEVICE
    from the resident full-precision rows copy: (N, D) bf16/f32 rows →
    ((D, n_pad) int8, (n_pad,) f32 scales), zero/one padding past N.

    When the device-rerank copy is resident anyway (the production int8
    configuration), this replaces the host-side ``quantize_matrix_t`` +
    second upload: at 1M x 1152 the host pays several numpy passes over a
    4.6 GB fp32 matrix plus a 1.15 GB transfer, all of which is a
    sub-second jitted transpose/quantize on the chip. The int8 values come
    from the storage-dtype rows rather than the fp32 originals — a
    sub-quantization-step difference that only perturbs shortlist
    selection; exact scores still come from the fused rescore.
    """
    n, d = rows.shape
    mf = rows.astype(jnp.float32)
    scales = jnp.max(jnp.abs(mf), axis=1) / 127.0          # (N,) per-vector
    scales = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(mf / scales[:, None]), -127, 127).astype(jnp.int8)
    q_t = jnp.zeros((d, n_pad), jnp.int8).at[:, :n].set(q.T)
    scales_p = jnp.ones((n_pad,), jnp.float32).at[:n].set(scales)
    return q_t, scales_p


def quantize_queries_device(q_f32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device per-row symmetric int8 quantization: (Q, D) f32 →
    ((Q, D) int8, (Q, 1) f32 scales). The scale is a positive per-row factor
    — rank-invariant — so shortlist-only callers may drop it."""
    qs = jnp.max(jnp.abs(q_f32), axis=1, keepdims=True) / 127.0
    qs = jnp.where(qs == 0, 1.0, qs)
    qi = jnp.clip(jnp.round(q_f32 / qs), -127, 127).astype(jnp.int8)
    return qi, qs


def _int8_topk_kernel(
    q_ref, m_ref, scales_ref, meta_ref, scores_ref, idx_ref,
    *, k: int, k_pad: int, tile_n: int, out_rows: int,
):
    """q_ref (Qp, D) int8; m_ref (D, TILE_N) int8; scales_ref (1, TILE_N) f32;
    meta_ref SMEM [(1,1) n_valid int32]; outputs (out_rows, k_pad).

    Qp is padded to the int8 sublane count (32) for the matmul, but the VPU
    top-k loop only runs over the first ``out_rows`` rows — the padding rows
    otherwise quadruple the reduction work, which dominates the per-tile
    cost once the scan is near the bandwidth roofline.
    """
    tile_idx = pl.program_id(0)
    base = tile_idx * tile_n

    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc[:out_rows].astype(jnp.float32) * scales_ref[0, :][None, :]

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    n_valid = meta_ref[0, 0]
    scores = jnp.where(col < n_valid, scores, _NEG_INF)

    bcol = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    s = scores
    cols_s, cols_i = [], []
    for _ in range(k):
        best = jnp.max(s, axis=1)
        best_idx = jnp.min(jnp.where(s == best[:, None], bcol, tile_n), axis=1)
        cols_s.append(best)
        cols_i.append(best_idx + base)
        s = jnp.where(bcol == best_idx[:, None], _NEG_INF, s)
    out_s = jnp.stack(cols_s, axis=1)
    out_i = jnp.stack(cols_i, axis=1)
    if k_pad > k:
        pad = ((0, 0), (0, k_pad - k))
        out_s = jnp.pad(out_s, pad, constant_values=_NEG_INF)
        out_i = jnp.pad(out_i, pad, constant_values=jnp.iinfo(jnp.int32).max)
    scores_ref[:] = out_s
    idx_ref[:] = out_i


# 6144 measured faster than 4096 (2.49 vs 2.81 ms at 1M rows on v5e): fewer
# grid steps amortize the per-tile overhead; 1152x6144 int8 = 7.1 MB still
# double-buffers inside the 16 MB VMEM. 8192 does not fit (2x9.4 MB).
INT8_TILE_N = 6144

# Packed-key extraction: the tile-local lane index rides in the low bits of
# a monotonic int32 key, so the per-candidate VPU loop needs only a
# max-reduce + mask pass (no index-locate pass). 13 bits covers lanes up to
# 8191 >= INT8_TILE_N-1.
_IDX_BITS = 13
_IDX_MASK = (1 << _IDX_BITS) - 1
# Largest int32 key a masked (-inf) lane can produce: -inf bits 0xFF800000
# sign-flip to u=0x007FFFFF, truncate + max lane term + final sign-bias →
# 0x807FFFFF. Any finite score keys strictly above this; the k_pad padding
# sentinel INT32_MIN is below it. "key <= this" ⇒ invalid candidate.
_NEGINF_KEY_MAX = -2139095041  # int32(0x807FFFFF)


def _pack_keys(scores: jnp.ndarray) -> jnp.ndarray:
    """f32 scores → monotonic int32 keys carrying the lane index.

    Standard unsigned-order float mapping (flip all bits of negatives, flip
    only the sign bit of non-negatives), truncate the low ``_IDX_BITS``
    (2^-11 relative precision — far below the ~1e-3 int8 quantization noise
    already present in shortlist selection), OR in ``_IDX_MASK - lane`` so
    truncation ties break to the LOWEST lane, and bias back to signed so
    ``jnp.max`` orders correctly. Keys are unique per lane, so the
    extraction loop's equality mask removes exactly one lane per round."""
    u = jax.lax.bitcast_convert_type(scores, jnp.uint32)
    flip = jnp.where(
        (u >> 31) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    u = u ^ flip
    lane = (
        jax.lax.broadcasted_iota(jnp.uint32, scores.shape, 1)
        & jnp.uint32(_IDX_MASK)
    )
    key = (u & jnp.uint32(~_IDX_MASK & 0xFFFFFFFF)) | (jnp.uint32(_IDX_MASK) - lane)
    return jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000), jnp.int32)


def _int8_packed_kernel(
    q_ref, m_ref, scales_ref, meta_ref, keys_ref,
    *, k: int, k_pad: int, tile_n: int, out_rows: int,
):
    """Packed-key variant of :func:`_int8_topk_kernel`: emits int32 keys
    (truncated score | tile-local index) instead of (score, idx) pairs.
    Measured 10–14% faster end-to-end at 1M rows (the max-and-mask loop
    halves its VPU passes; scripts/probe_topk_int8.py: 5.79 vs 6.47 ms at
    k_tile=80, shortlist overlap 1.0000@512). Only the FUSED rescore path
    uses it — exact scores come from the rescore, so the key truncation
    never reaches a returned score."""
    base = pl.program_id(0) * tile_n
    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc[:out_rows].astype(jnp.float32) * scales_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < meta_ref[0, 0], scores, _NEG_INF)
    keys = _pack_keys(scores)
    outs = []
    for _ in range(k):
        best = jnp.max(keys, axis=1)
        outs.append(best)
        keys = jnp.where(keys == best[:, None], jnp.iinfo(jnp.int32).min, keys)
    out = jnp.stack(outs, axis=1)
    if k_pad > k:
        out = jnp.pad(
            out, ((0, 0), (0, k_pad - k)),
            constant_values=jnp.iinfo(jnp.int32).min,
        )
    keys_ref[:] = out


def _int8_candidates_packed(
    q_int8: jnp.ndarray,
    matrix_int8_t: jnp.ndarray,
    scales: jnp.ndarray,
    k_tile: int,
    n_valid: jnp.ndarray,
    tile_n: int,
    interpret: bool,
) -> jnp.ndarray:
    """Per-tile top-``k_tile`` packed keys, (out_rows, num_tiles*k_pad) with
    k_pad = k_tile rounded up to 128; padding lanes carry INT32_MIN.
    Callers recover global row indices via ``pos // k_pad * tile_n + local``
    where ``local`` unpacks from the key's low bits."""
    q_count, d = q_int8.shape
    n = matrix_int8_t.shape[1]
    tile = min(tile_n, n)
    assert n % tile == 0, "matrix must be pre-padded to the tile size"
    assert tile <= _IDX_MASK + 1, "tile too wide for packed lane bits"
    num_tiles = n // tile

    q_pad = (-q_count) % 32
    if q_pad:
        q_int8 = jnp.pad(q_int8, ((0, q_pad), (0, 0)))
    qp = q_int8.shape[0]
    out_rows = min(qp, max(8, -(-q_count // 8) * 8))

    k_pad = -(-k_tile // 128) * 128
    kernel = functools.partial(
        _int8_packed_kernel, k=k_tile, k_pad=k_pad, tile_n=tile, out_rows=out_rows
    )
    keys = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_rows, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, num_tiles * k_pad), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d + qp * d + n * 4,
            transcendentals=0,
        ),
    )(q_int8, matrix_int8_t, scales.reshape(1, -1),
      jnp.reshape(n_valid.astype(jnp.int32), (1, 1)))[0]
    return keys


def _int8_candidates(
    q_int8: jnp.ndarray,
    matrix_int8_t: jnp.ndarray,
    scales: jnp.ndarray,
    k_tile: int,
    n_valid: jnp.ndarray,
    tile_n: int,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw per-tile candidate buffers (out_rows, num_tiles*k_pad): each tile's
    top-``k_tile`` scaled scores + global indices, padding lanes carry
    (-inf, INT32_MAX) sentinels. Callers merge (top-k or deeper shortlist)."""
    q_count, d = q_int8.shape
    n = matrix_int8_t.shape[1]
    tile = min(tile_n, n)
    assert n % tile == 0, "matrix must be pre-padded to the tile size"
    num_tiles = n // tile

    # int8 sublane tiling is 32; pad queries accordingly. Outputs only carry
    # the fp32-sublane-aligned real rows.
    q_pad = (-q_count) % 32
    if q_pad:
        q_int8 = jnp.pad(q_int8, ((0, q_pad), (0, 0)))
    qp = q_int8.shape[0]
    out_rows = min(qp, max(8, -(-q_count // 8) * 8))

    meta = jnp.reshape(n_valid.astype(jnp.int32), (1, 1))
    scales2d = scales.reshape(1, -1)

    k_pad = -(-k_tile // 128) * 128
    kernel = functools.partial(
        _int8_topk_kernel, k=k_tile, k_pad=k_pad, tile_n=tile, out_rows=out_rows
    )
    scores, idx = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_rows, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_rows, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, num_tiles * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((out_rows, num_tiles * k_pad), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d + qp * d + n * 4,
            transcendentals=0,
        ),
    )(q_int8, matrix_int8_t, scales2d, meta)
    return scores, idx


def _int8_scores_kernel(
    q_ref, m_ref, scales_ref, meta_ref, out_ref, *, tile_n: int, out_rows: int
):
    """Matmul-only variant: emits the raw scaled f32 scores for the tile —
    no in-kernel extraction at all. The shortlist is built OUTSIDE the
    kernel from the materialized (out_rows, N) score matrix (4 MB/query at
    1M rows — noise next to the 1.15 GB matrix read). Deleting the
    k_tile extraction rounds is worth ~1.5 ms at 1M rows (k_tile=80 costs
    80 VPU max-and-mask passes per tile; scripts/probe_fused_overhead.py)."""
    base = pl.program_id(0) * tile_n
    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc[:out_rows].astype(jnp.float32) * scales_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    out_ref[:] = jnp.where(col < meta_ref[0, 0], scores, _NEG_INF)


def int8_scores_pallas(
    q_int8: jnp.ndarray,
    matrix_int8_t: jnp.ndarray,
    scales: jnp.ndarray,
    n_valid: jnp.ndarray,
    tile_n: int = INT8_TILE_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, D) int8 queries → (Q, N) f32 scaled scores (padding cols -inf)."""
    q_count, d = q_int8.shape
    n = matrix_int8_t.shape[1]
    tile = min(tile_n, n)
    assert n % tile == 0, "matrix must be pre-padded to the tile size"
    num_tiles = n // tile
    q_pad = (-q_count) % 32
    if q_pad:
        q_int8 = jnp.pad(q_int8, ((0, q_pad), (0, 0)))
    qp = q_int8.shape[0]
    out_rows = min(qp, max(8, -(-q_count // 8) * 8))
    kernel = functools.partial(
        _int8_scores_kernel, tile_n=tile, out_rows=out_rows
    )
    scores = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((out_rows, n), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d + qp * d + n * 4 + out_rows * n * 4,
            transcendentals=0,
        ),
    )(q_int8, matrix_int8_t, scales.reshape(1, -1),
      jnp.reshape(n_valid.astype(jnp.int32), (1, 1)))[0]
    return scores[:q_count]


def _int8_scores_xla(q_int8, matrix_int8_t, scales, n_valid):
    """XLA analog of :func:`int8_scores_pallas` (CPU tests / small indexes)."""
    acc = jax.lax.dot_general(
        q_int8, matrix_int8_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * scales[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, matrix_int8_t.shape[1]), 1)
    return jnp.where(col < n_valid, scores, _NEG_INF)


def _verified_shortlist(
    scores: jnp.ndarray, m: int, verify_depth: int, recall_target: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approx top-``m`` over materialized scores + a PROVEN-content flag.

    ``lax.approx_max_k`` (TPU PartialReduce) is near-free at its default
    bin sizing but may silently drop mid-rank candidates. A count verify
    proves (or disproves) shortlist sufficiency without assuming anything
    about the reduction: with t = the J-th shortlist score
    (J = ``verify_depth``), per query

        ok ⟺ |{scores > t}| == |{shortlist > t}|      (no miss above t)
             ∧ |{scores == t}| == |{shortlist == t}|  (no tie straddles t)

    — four cheap reductions over the already-materialized score matrix.
    ``ok`` (scalar, all-queries) is RETURNED for a host-side decision, NOT
    branched on in-program: ``lax.cond`` measurably executes both branches
    on this backend (an in-program ``lax.top_k(scores, m)`` fallback costs
    ~25/100 ms at q=16/64 — scripts/probe_shortlist_matrix.py), so the
    caller re-runs the extract-kernel program on the rare !ok instead
    (~9% of random 1M-row single queries at J=64).

    Guarantee when ok: the candidate set contains the TRUE int8-score
    top-J exactly — ties included — plus up to m-J opportunistic extras.
    """
    s_a, cand_a = jax.lax.approx_max_k(scores, m, recall_target=recall_target)
    cand_a = cand_a.astype(jnp.int32)
    j = min(verify_depth, m)
    t = s_a[:, j - 1][:, None]
    above = jnp.sum(scores > t, axis=1)
    above_s = jnp.sum(s_a > t, axis=1)
    eq = jnp.sum(scores == t, axis=1)
    eq_s = jnp.sum(s_a == t, axis=1)
    ok = jnp.all(((above == above_s) & (eq == eq_s)) | jnp.isneginf(t[:, 0]))
    return s_a, cand_a, ok


# Shortlist construction for the fused path ("auto" resolves in
# resolve_shortlist_method): "verified" = scores kernel + approx_max_k +
# count-verify, host falls back to "extract" on the rare miss (2.6 ms at
# 1M vs 4.0 — the single-query default on TPU); "approx" = same without
# the verify/fallback (opt-in speed mode: 2.7 ms for a 16-query batch =
# 2.7x the extract qps, top-k content may deviate ~1%/query from the
# exact paths on near-ties); "exact" = scores + lax.top_k (exact
# top-shortlist by construction, single-query diagnostics — batched XLA
# top_k is catastrophically slow); "extract" = the in-kernel packed-key
# extraction (batch default; also serves when the (Q, N) score matrix
# would exceed the transient-HBM cap below).
import os as _os

_SCORES_HBM_CAP_MB = float(_os.environ.get("TPUCLIP_SCORES_HBM_MB", "1024"))

# approx_max_k recall target for the verified shortlist. Swept on v5e at
# 1M x 1152 (scripts/probe_verified_config.py): higher targets DO push the
# proof-pass rate to ~1.0 (0.999 → 188-192/192) but the PartialReduce keeps
# so many more per-bin candidates that the fused program slows past the
# fallback it avoids — device p50 3.5/5.7/10.9 ms at m=128/256/512 with
# r=0.999 vs 1.56 ms shipped; deeper m at r=0.95 buys NOTHING (identical
# misses at m=512/768 — PROBE_SET=deep). The pass rate also varies
# run-to-run on identical deterministic inputs (0.906 vs 0.786 across
# processes), so r3.7 attacks the fallback cost instead: a proof miss now
# pays only an exact top_k over the RESIDENT score matrix
# (topk_exact_from_scores), not a second scan. Keep 0.95; the env knob
# exists for distribution-specific tuning.
_SHORTLIST_RECALL = float(
    _os.environ.get("TPUCLIP_SHORTLIST_RECALL", "0.95")
)


def resolve_shortlist_method(q_count: int, on_tpu: bool) -> str:
    """Default policy, env-overridable via TPUCLIP_SHORTLIST."""
    env = _os.environ.get("TPUCLIP_SHORTLIST", "auto")
    if env != "auto":
        return env
    if not on_tpu:
        return "extract"
    return "verified" if q_count == 1 else "extract"


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def topk_int8_pallas(
    q_int8: jnp.ndarray,       # (Q, D) int8
    matrix_int8_t: jnp.ndarray,  # (D, N) int8, pre-padded to tile multiple
    scales: jnp.ndarray,       # (N,) float32 (padded width)
    q_scale: jnp.ndarray,      # () float32
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    tile_n: int = INT8_TILE_N,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    q_count = q_int8.shape[0]
    n = matrix_int8_t.shape[1]
    if n_valid is None:
        n_valid = jnp.asarray(n, jnp.int32)
    k_eff = min(k, n) if n > 0 else 0
    if k_eff == 0:
        return (
            jnp.zeros((q_count, 0), jnp.float32),
            jnp.zeros((q_count, 0), jnp.int32),
        )
    scores, idx = _int8_candidates(
        q_int8, matrix_int8_t, scales, k_eff, n_valid, tile_n, interpret
    )
    merged_s, merged_i = _final_merge(scores, idx, k_eff)
    return merged_s[:q_count] * q_scale, merged_i[:q_count]


@functools.partial(jax.jit, static_argnames=("k",))
def topk_int8_xla(
    q_int8, matrix_int8_t, scales, q_scale, k, n_valid=None, mask=None
):
    """XLA path (CPU tests / masked searches)."""
    n = matrix_int8_t.shape[1]
    k_eff = min(k, n) if n > 0 else 0
    if k_eff == 0:
        return (
            jnp.zeros((q_int8.shape[0], 0), jnp.float32),
            jnp.zeros((q_int8.shape[0], 0), jnp.int32),
        )
    acc = jax.lax.dot_general(
        q_int8, matrix_int8_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * scales[None, :]
    if mask is not None:
        scores = scores + mask[None, :]
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(col < n_valid, scores, _NEG_INF)
    top_s, top_i = jax.lax.top_k(scores, k_eff)
    order = jnp.lexsort((top_i, -top_s), axis=-1)
    return (
        jnp.take_along_axis(top_s, order, axis=1) * q_scale,
        jnp.take_along_axis(top_i, order, axis=1).astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "shortlist", "tile_n", "use_pallas", "use_packed", "interpret",
        "shortlist_method", "shortlist_recall", "keep_scores",
    ),
)
def topk_int8_rerank_fused(
    q_f32: jnp.ndarray,          # (Q, D) float32 queries (unquantized)
    matrix_int8_t: jnp.ndarray,  # (D, N) int8, pre-padded to tile multiple
    scales: jnp.ndarray,         # (N,) float32 per-vector scales
    rows_full: jnp.ndarray,      # (N_rows, D) bf16/f32 row-major full-precision copy
    k: int,
    shortlist: int = 512,
    n_valid: Optional[jnp.ndarray] = None,
    tile_n: int = INT8_TILE_N,
    use_pallas: bool = True,
    use_packed: bool = True,
    interpret: bool = False,
    shortlist_method: Optional[str] = None,
    shortlist_recall: Optional[float] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE device program: int8 scan -> top-``shortlist`` merge -> gather the
    shortlisted rows from the resident full-precision matrix -> exact rescore
    -> final (score desc, idx asc) top-k.

    This is the production int8 serving path: the 1.15 GB int8 matrix is the
    only full scan (vs 2.3 GB bf16 — ~2x less HBM read), and exactness comes
    from rescoring the tiny shortlist against ``rows_full`` on device (a few
    MB of gathers), replacing round-1's host-memmap re-rank
    (index/search.py:_exact_rerank) whose fetch+numpy ran per query on the
    host. Scores returned are bit-identical to the full bf16 scan's for any
    candidate both paths return.

    Shortlist construction (``shortlist_method`` / TPUCLIP_SHORTLIST):

    - ``"approx"`` (default): the scan kernel emits raw f32 scores
      (:func:`int8_scores_pallas`) and ``lax.approx_max_k`` builds the
      shortlist, made contract-safe by :func:`_verified_shortlist`'s count
      verify + exact-top_k fallback. Guaranteed to contain the true
      int8-score top-J (J = max(64, 4k)) with ties resolved per the
      (score desc, idx asc) contract, plus opportunistic candidates to
      ``shortlist`` depth. Measured 2.6 ms at 1M x 1152 on v5e.
    - ``"exact"``: scores + ``lax.top_k`` — the full ``shortlist`` depth
      is exact by construction (3.2 ms).
    - ``"extract"``: the in-kernel per-tile packed-key extraction
      (4.0 ms; no (Q, N) score materialization — serves automatically
      when the score matrix would exceed TPUCLIP_SCORES_HBM_MB).

    Recall contract (all methods): a true top-k item is returned iff it
    survives the int8 shortlist. With unit-norm vectors int8 quantization
    perturbs cosine scores by ~1e-3, so at the guaranteed depths the miss
    probability is negligible (property-tested in tests/test_topk_int8.py);
    the extract path additionally requires the item to survive its tile's
    top-``k_tile`` (>= 4k per tile).
    """
    q_count, d = q_f32.shape
    n = matrix_int8_t.shape[1]
    if n_valid is None:
        n_valid = jnp.asarray(n, jnp.int32)
    k_eff = min(k, n) if n > 0 else 0
    if k_eff == 0:
        empty = (
            jnp.zeros((q_count, 0), jnp.float32),
            jnp.zeros((q_count, 0), jnp.int32),
        )
        if shortlist_method == "verified":
            empty += (jnp.asarray(True),)
            if keep_scores:
                empty += (jnp.zeros((q_count, 0), jnp.float32),)
        return empty

    # Shortlist selection skips the (rank-invariant) query scale; exact
    # scores come from the rescore anyway.
    qi, _ = quantize_queries_device(q_f32)

    # Depth safety: the shortlist must cover k, and the per-tile Pallas
    # extraction caps at 128 candidates/tile — beyond that the XLA candidate
    # path keeps the exact per-k depth instead of silently truncating.
    m = min(max(shortlist, 4 * k_eff), n)
    use_pallas = use_pallas and k_eff <= 128
    # VMEM scaling with the query batch: the kernel's scoped stack holds the
    # (D, tile) int8 block twice (double buffer) plus (qp, tile) int32/f32
    # accumulators — at q=64 the 6144 tile overflows the 16 MB limit
    # (measured: 17.38 M requested). Narrow the tile as qp grows; 3072 and
    # 2048 divide any INT8_TILE_N-padded width, so the same matrix serves
    # every batch size.
    qp_est = q_count + ((-q_count) % 32)
    if use_pallas and tile_n == INT8_TILE_N and qp_est > 32:
        narrower = 3072 if qp_est <= 64 else 2048
        if n % narrower == 0:
            tile_n = narrower

    # Scores-materializing shortlist (r3 redesign, scripts/probe_*): the
    # scan kernel emits raw f32 scores and the shortlist is built outside.
    # "verified" additionally returns the proof flag for the caller's
    # host-side fallback decision (NO in-program lax.cond — see
    # _verified_shortlist). Gated by a transient-HBM cap on the
    # (out_rows, N) f32 score matrix; past it the extract path serves
    # (still proof-clean, so a gated-out "verified" reports ok=True).
    method = shortlist_method or "extract"
    out_rows_est = min(qp_est, max(8, -(-q_count // 8) * 8))
    scores_fit = out_rows_est * n * 4 <= _SCORES_HBM_CAP_MB * 1e6
    shortlist_ok = None
    if method in ("approx", "exact", "verified") and scores_fit:
        pallas_ok = use_pallas and n >= tile_n and n % tile_n == 0
        if pallas_ok:
            scores_all = int8_scores_pallas(
                qi, matrix_int8_t, scales, n_valid, tile_n, interpret
            )[:q_count]
        else:
            scores_all = _int8_scores_xla(qi, matrix_int8_t, scales, n_valid)[
                :q_count
            ]
        if method == "exact":
            top_s, cand = jax.lax.top_k(scores_all, m)
            cand = cand.astype(jnp.int32)
        elif method == "approx":
            top_s, cand = jax.lax.approx_max_k(scores_all, m)
            cand = cand.astype(jnp.int32)
        else:
            top_s, cand, shortlist_ok = _verified_shortlist(
                scores_all, m, verify_depth=min(m, max(64, 4 * k_eff)),
                recall_target=(
                    _SHORTLIST_RECALL
                    if shortlist_recall is None
                    else shortlist_recall
                ),
            )
        cand_invalid = jnp.isneginf(top_s)
    elif use_pallas and n >= tile_n and n % tile_n == 0:
        num_tiles = n // min(tile_n, n)
        # Per-tile depth: any single tile must be able to supply 4x the final
        # k (matching the host-rerank path's shortlist margin — at large N
        # 2*ceil(m/num_tiles) collapses to ~k_eff, and >k near-ties
        # concentrated in one tile, e.g. near-duplicate images, could then
        # evict a true top-k row on int8 noise before the global merge sees
        # it), plus proportional shortlist headroom — NOT shortlist-deep
        # (the k-round extraction runs per tile; keep it cheap).
        k_tile = min(128, max(4 * k_eff, 2 * (-(-m // num_tiles))))
        if use_packed and min(tile_n, n) <= _IDX_MASK + 1:
            # Packed-key extraction (default): ~10-14% faster scan, same
            # shortlist (probe: overlap 1.0000@512); key truncation only
            # perturbs shortlist tie selection, never returned scores.
            keys = _int8_candidates_packed(
                qi, matrix_int8_t, scales, k_tile, n_valid, tile_n, interpret
            )[:q_count]
            k_pad = -(-k_tile // 128) * 128
            m = min(m, keys.shape[1])
            top_keys, pos = jax.lax.top_k(keys, m)
            u = (
                jax.lax.bitcast_convert_type(top_keys, jnp.uint32)
                ^ jnp.uint32(0x80000000)
            )
            local = (jnp.uint32(_IDX_MASK) - (u & jnp.uint32(_IDX_MASK))).astype(
                jnp.int32
            )
            cand = (pos // k_pad) * min(tile_n, n) + local
            cand_invalid = top_keys <= jnp.int32(_NEGINF_KEY_MAX)
        else:
            scores_q, rows_q = _int8_candidates(
                qi, matrix_int8_t, scales, k_tile, n_valid, tile_n, interpret
            )
            scores_q, rows_q = scores_q[:q_count], rows_q[:q_count]
            m = min(m, rows_q.shape[1])
            top_s, pos = jax.lax.top_k(scores_q, m)
            cand = jnp.take_along_axis(rows_q, pos, axis=1)
            cand_invalid = jnp.isneginf(top_s)
    else:
        scores_q, rows_q = topk_int8_xla(
            qi, matrix_int8_t, scales, jnp.asarray(1.0, jnp.float32),
            m, n_valid=n_valid,
        )
        top_s, pos = jax.lax.top_k(scores_q, m)
        cand = jnp.take_along_axis(rows_q, pos, axis=1)  # (Q, M) row indices
        cand_invalid = jnp.isneginf(top_s)

    out = _rescore_select(cand, cand_invalid, q_f32, rows_full, k_eff)
    if shortlist_method == "verified":
        # Three-tuple return for the host-side fallback decision; constant
        # True when a gate routed to a proof-clean path (extract/exact).
        ok = shortlist_ok if shortlist_ok is not None else jnp.asarray(True)
        if keep_scores:
            # Resident-scores fourth output: the already-materialized
            # (Q, N) int8 score matrix stays on device so a proof failure
            # needs only an exact top_k over it + rescore
            # (topk_exact_from_scores) — NOT a second full scan. Empty
            # (Q, 0) when a gate routed away from the scores path (then
            # ok is constant True and the output is never consumed).
            scores_res = (
                scores_all
                if shortlist_ok is not None
                else jnp.zeros((q_count, 0), jnp.float32)
            )
            return out + (ok, scores_res)
        return out + (ok,)
    return out


def _rescore_select(cand, cand_invalid, q_f32, rows_full, k_eff):
    """Shared fused-path tail: exact rescore of a candidate shortlist +
    final (score desc, idx asc) top-``k_eff``.

    Exact rescore: gather candidate rows and dot with f32 accumulation.
    To return the SAME scores the bf16 scan computes, the query must be
    rounded to the storage dtype first — and that rounding must be done
    with integer bit ops (round_f32_to_bf16_bits): under jit, XLA's
    excess-precision rule elides an `astype(bf16)` that feeds the dot's
    internal f32 upcast and substitutes the UNROUNDED query (measured
    3e-3 score divergence from the bf16 scan on v5e — enough to drop true
    top-k items near the cutoff; verified by bit-exact match against a
    host emulation with the unrounded query). With the query genuinely
    rounded, products of bf16-rounded inputs are exact in f32, so scores
    match the scan's up to f32 summation order (~1e-6).
    """
    n_rows = rows_full.shape[0]
    safe = jnp.clip(cand, 0, n_rows - 1)
    if rows_full.dtype == jnp.bfloat16:
        qr = round_f32_to_bf16_bits(q_f32.astype(jnp.float32))
    else:
        qr = q_f32.astype(jnp.float32)
    gathered = rows_full[safe].astype(jnp.float32)  # (Q, M, D)
    exact = jnp.einsum(
        "qmd,qd->qm", gathered, qr, preferred_element_type=jnp.float32
    )
    invalid = (cand < 0) | (cand >= n_rows) | cand_invalid
    exact = jnp.where(invalid, _NEG_INF, exact)
    sort_rows = jnp.where(invalid, jnp.iinfo(jnp.int32).max, cand)
    order = jnp.lexsort((sort_rows, -exact), axis=-1)[:, :k_eff]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(sort_rows, order, axis=1),
    )


def fallback_shortlist_depth(k: int, n: int, shortlist: int = 512) -> int:
    """Shortlist depth for the proof-miss fallback over the resident score
    matrix — ONE definition shared by topk_int8_rerank_fused_auto and
    DeviceIndex._run_fused, so the two 'identical' fallback paths cannot
    drift apart if the formula is ever tuned."""
    return min(max(shortlist, 4 * min(k, n)), n)


@functools.partial(jax.jit, static_argnames=("k", "m"))
def topk_exact_from_scores(scores, q_f32, rows_full, k, m):
    """Exact top-``k`` from an already-materialized int8 score matrix.

    The cheap proof-failure fallback for the verified shortlist: instead
    of re-running the full extract scan (~3.2 ms at 1M×1152 — or, on the
    fused text path, the whole text tower again), run ``lax.top_k`` over
    the (Q, N) scores the verified program kept resident
    (``keep_scores=True``), then the shared exact-rescore tail. The exact
    top-``m`` of the int8 scores is the STRONGEST possible int8 shortlist
    — a superset-in-quality of both the approx and extract shortlists —
    so results carry the same contract: every true top-k item that
    survives int8 quantization is returned, ties (score desc, idx asc).
    """
    k_eff = min(k, scores.shape[1])
    top_s, cand = jax.lax.top_k(scores, m)
    return _rescore_select(
        cand.astype(jnp.int32), jnp.isneginf(top_s), q_f32, rows_full, k_eff
    )


def topk_int8_rerank_fused_auto(
    q_f32,
    matrix_int8_t,
    scales,
    rows_full,
    k: int,
    shortlist: int = 512,
    n_valid=None,
    use_pallas: bool = True,
    stats: Optional[dict] = None,
):
    """Host-level fused search: verified fast path + resident-scores fallback.

    Single TPU queries run the scores-kernel + verified-approx shortlist
    program (~2.6 ms at 1M x 1152 vs 4.0 for the in-kernel extraction);
    when the proof flag comes back False (~9-21% of random 1M-row queries
    — run-to-run variable, the PartialReduce's drop pattern is not stable
    across processes on identical inputs), an exact ``lax.top_k`` runs
    over the score matrix the verified program kept RESIDENT on device
    (topk_exact_from_scores) — no second scan, no re-quantization. The
    fallback's exact top-m shortlist strictly dominates the extract
    kernel's per-tile one, so results carry the same by-construction
    guarantee. Batches and CPU keep the extract path (batched XLA
    top_k/approx_max_k degrade catastrophically —
    scripts/probe_shortlist_matrix.py). Policy env-overridable via
    TPUCLIP_SHORTLIST (auto|verified|approx|exact|extract).
    """
    import numpy as _np

    method = resolve_shortlist_method(int(q_f32.shape[0]), bool(use_pallas))
    if method == "verified":
        s, i, ok, scores_res = topk_int8_rerank_fused(
            q_f32, matrix_int8_t, scales, rows_full, k, shortlist=shortlist,
            n_valid=n_valid, use_pallas=use_pallas, shortlist_method="verified",
            keep_scores=True,
        )
        if stats is not None:
            stats["verified_queries"] = stats.get("verified_queries", 0) + 1
        if bool(_np.asarray(ok)):
            return s, i
        if stats is not None:
            stats["shortlist_fallbacks"] = stats.get("shortlist_fallbacks", 0) + 1
        # ok can only be False when the scores path actually ran, so the
        # resident matrix is always non-empty here.
        n = scores_res.shape[1]
        m = fallback_shortlist_depth(k, n, shortlist)
        return topk_exact_from_scores(scores_res, q_f32, rows_full, k, m)
    return topk_int8_rerank_fused(
        q_f32, matrix_int8_t, scales, rows_full, k, shortlist=shortlist,
        n_valid=n_valid, use_pallas=use_pallas, shortlist_method=method,
    )


def _fused_embedding_tail(out, emb, shortlist_method, keep_scores):
    """Shared extra-output contract of the tower-fused wrappers: with
    ``keep_scores`` on the verified program, the (fp32) query embedding
    follows the resident score matrix so a proof miss never re-runs the
    tower. One place, three wrappers — a drifted copy would produce a
    wrong-arity unpack in DeviceIndex._run_fused."""
    if keep_scores and shortlist_method == "verified":
        return out + (emb.astype(jnp.float32),)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "compute_dtype", "use_pallas", "shortlist",
        "shortlist_method", "keep_scores",
    ),
)
def text_topk_fused(
    params,
    ids: jnp.ndarray,            # (B, 64) int token ids (prompted + padded)
    attn_mask: jnp.ndarray,      # (B, 64) attention mask
    matrix_int8_t: jnp.ndarray,  # (D, N) int8
    scales: jnp.ndarray,         # (N,) f32
    rows_full: jnp.ndarray,      # (N_rows, D) storage-dtype full copy
    config,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    shortlist: int = 512,
    compute_dtype=jnp.float32,
    use_pallas: bool = True,
    shortlist_method: Optional[str] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token ids → text tower → int8 scan → exact rescore → top-k, ONE
    device program. The embedding never returns to the host — the serving
    text-query path pays a single host↔device round trip (the reference
    pays one per stage: tokenize→embed→SQL scan, image_database.py:509-543,
    :1564). Results identical to embed-then-search by construction.

    ``shortlist_method="verified"`` adds the proof flag as a third output
    (see :func:`topk_int8_rerank_fused`); with ``keep_scores=True`` the
    resident (Q, N) score matrix AND the text embedding follow as fourth
    and fifth outputs so a proof failure costs only
    :func:`topk_exact_from_scores` — neither the text tower nor the scan
    re-runs (both stay on device; no host transfer on the happy path)."""
    from tpuclip.models.siglip import get_text_features

    emb = get_text_features(
        params, ids, config, compute_dtype=compute_dtype, attention_mask=attn_mask
    )
    out = topk_int8_rerank_fused(
        emb, matrix_int8_t, scales, rows_full, k,
        shortlist=shortlist, n_valid=n_valid, use_pallas=use_pallas,
        shortlist_method=shortlist_method, keep_scores=keep_scores,
    )
    return _fused_embedding_tail(out, emb, shortlist_method, keep_scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "compute_dtype", "use_pallas", "shortlist",
        "shortlist_method", "keep_scores",
    ),
)
def image_topk_fused(
    params,
    pixels: jnp.ndarray,         # (B, S, S, 3) uint8 NHWC (query resolution)
    matrix_int8_t: jnp.ndarray,  # (D, N) int8
    scales: jnp.ndarray,         # (N,) f32
    rows_full: jnp.ndarray,      # (N_rows, D) storage-dtype full copy
    config,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    shortlist: int = 512,
    compute_dtype=jnp.float32,
    use_pallas: bool = True,
    shortlist_method: Optional[str] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 pixels → vision tower → int8 scan → exact rescore → top-k, ONE
    device program — the image-query analog of :func:`text_topk_fused`.

    The reference's image query runs tower inference and the SQL vector
    scan as separate stages with a host round trip of the embedding in
    between (image_database.py:443-507 then :1564); here the embedding
    stays on device. Results identical to embed-then-search by
    construction. Same ``shortlist_method="verified"`` / ``keep_scores``
    extra-output contract as :func:`text_topk_fused` (fifth output is the
    image embedding, so a proof miss re-runs neither the vision tower nor
    the scan — just :func:`topk_exact_from_scores`)."""
    from tpuclip.models.siglip import get_image_features

    emb = get_image_features(params, pixels, config, compute_dtype=compute_dtype)
    out = topk_int8_rerank_fused(
        emb, matrix_int8_t, scales, rows_full, k,
        shortlist=shortlist, n_valid=n_valid, use_pallas=use_pallas,
        shortlist_method=shortlist_method, keep_scores=keep_scores,
    )
    return _fused_embedding_tail(out, emb, shortlist_method, keep_scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "compute_dtype", "use_pallas", "shortlist",
        "shortlist_method", "keep_scores",
    ),
)
def naflex_image_topk_fused(
    params,
    patches: jnp.ndarray,        # (B, L, P*P*C) uint8 patchified pixels
    pixel_mask: jnp.ndarray,     # (B, L) valid-patch mask
    spatial_shapes: jnp.ndarray,  # (B, 2) patch grids
    matrix_int8_t: jnp.ndarray,  # (D, N) int8
    scales: jnp.ndarray,         # (N,) f32
    rows_full: jnp.ndarray,      # (N_rows, D) storage-dtype full copy
    config,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    shortlist: int = 512,
    compute_dtype=jnp.float32,
    use_pallas: bool = True,
    shortlist_method: Optional[str] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`image_topk_fused` for the NaFlex (variable-aspect) family:
    uint8 patches + mask + grid → NaFlex vision tower → int8 scan → exact
    rescore → top-k, ONE device program. Same extra-output contract."""
    from tpuclip.models.naflex import get_image_features_naflex

    emb = get_image_features_naflex(
        params, patches, pixel_mask, spatial_shapes, config,
        compute_dtype=compute_dtype,
    )
    out = topk_int8_rerank_fused(
        emb, matrix_int8_t, scales, rows_full, k,
        shortlist=shortlist, n_valid=n_valid, use_pallas=use_pallas,
        shortlist_method=shortlist_method, keep_scores=keep_scores,
    )
    return _fused_embedding_tail(out, emb, shortlist_method, keep_scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "compute_dtype", "use_pallas", "shortlist",
        "shortlist_method", "keep_scores",
    ),
)
def mixed_topk_fused(
    params,
    ids: jnp.ndarray,            # (Tb, 64) token ids (prompted + padded rows)
    attn_mask: jnp.ndarray,      # (Tb, 64) attention mask (pad rows all-zero)
    pixels: jnp.ndarray,         # (Ib, S, S, 3) uint8 NHWC (pad rows zero)
    matrix_int8_t: jnp.ndarray,  # (D, N) int8
    scales: jnp.ndarray,         # (N,) f32
    rows_full: jnp.ndarray,      # (N_rows, D) storage-dtype full copy
    config,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    shortlist: int = 512,
    compute_dtype=jnp.float32,
    use_pallas: bool = True,
    shortlist_method: Optional[str] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed text+image query block: text tower + vision tower + ONE int8
    scan over the concatenated (texts-first) query block, exact rescore,
    top-k — one device program.

    Why: the scan's cost is ~flat in the query count (it is an HBM
    bandwidth read of the matrix), so a mixed serve window that runs the
    text group and the image group as separate passes pays that read
    twice. Measured on v5e (scripts/probe_mixed_batch.py, 1M x 1152,
    2 texts + 2 images): separate passes 8.20 ms, combined 5.00 ms —
    the second scan is pure waste. Row layout of every output: texts
    occupy rows [0, Tb), images rows [Tb, Tb+Ib); the caller slices the
    real (unpadded) entries out of each span. Same
    ``shortlist_method="verified"`` / ``keep_scores`` extra-output
    contract as :func:`text_topk_fused` (fifth output is the concatenated
    query embedding block)."""
    from tpuclip.models.siglip import get_image_features, get_text_features

    emb_t = get_text_features(
        params, ids, config, compute_dtype=compute_dtype, attention_mask=attn_mask
    )
    emb_v = get_image_features(params, pixels, config, compute_dtype=compute_dtype)
    emb = jnp.concatenate([emb_t, emb_v], axis=0)
    out = topk_int8_rerank_fused(
        emb, matrix_int8_t, scales, rows_full, k,
        shortlist=shortlist, n_valid=n_valid, use_pallas=use_pallas,
        shortlist_method=shortlist_method, keep_scores=keep_scores,
    )
    return _fused_embedding_tail(out, emb, shortlist_method, keep_scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "compute_dtype", "use_pallas", "shortlist",
        "shortlist_method", "keep_scores",
    ),
)
def mixed_naflex_topk_fused(
    params,
    ids: jnp.ndarray,            # (Tb, 64) token ids (prompted + padded rows)
    attn_mask: jnp.ndarray,      # (Tb, 64) attention mask (pad rows all-zero)
    patches: jnp.ndarray,        # (Ib, L, P*P*C) uint8 patchified pixels
    pixel_mask: jnp.ndarray,     # (Ib, L) valid-patch mask
    spatial_shapes: jnp.ndarray,  # (Ib, 2) patch grids
    matrix_int8_t: jnp.ndarray,  # (D, N) int8
    scales: jnp.ndarray,         # (N,) f32
    rows_full: jnp.ndarray,      # (N_rows, D) storage-dtype full copy
    config,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    shortlist: int = 512,
    compute_dtype=jnp.float32,
    use_pallas: bool = True,
    shortlist_method: Optional[str] = None,
    keep_scores: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`mixed_topk_fused` for the NaFlex (variable-aspect) family:
    text tower + NaFlex vision tower + ONE shared int8 scan + exact
    rescore, one device program. Same texts-first row layout and
    extra-output contract."""
    from tpuclip.models.naflex import get_image_features_naflex
    from tpuclip.models.siglip import get_text_features

    emb_t = get_text_features(
        params, ids, config, compute_dtype=compute_dtype, attention_mask=attn_mask
    )
    emb_v = get_image_features_naflex(
        params, patches, pixel_mask, spatial_shapes, config,
        compute_dtype=compute_dtype,
    )
    emb = jnp.concatenate([emb_t, emb_v], axis=0)
    out = topk_int8_rerank_fused(
        emb, matrix_int8_t, scales, rows_full, k,
        shortlist=shortlist, n_valid=n_valid, use_pallas=use_pallas,
        shortlist_method=shortlist_method, keep_scores=keep_scores,
    )
    return _fused_embedding_tail(out, emb, shortlist_method, keep_scores)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_int8_batch(q_f32, matrix_int8_t, scales, k, n_valid=None, mask=None):
    """Batched int8 scan with ON-DEVICE per-row query quantization.

    One compiled program does quantize + int8 matmul + top-k + scale fold —
    the serve micro-batcher calls this per request group, so no host numpy
    runs per request (round-1 quantized on host per call)."""
    qi, qs = quantize_queries_device(q_f32)
    s, i = topk_int8_xla(
        qi, matrix_int8_t, scales, jnp.asarray(1.0, jnp.float32), k,
        n_valid=n_valid, mask=mask,
    )
    return s * qs, i
