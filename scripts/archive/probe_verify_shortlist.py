"""Verified-approx shortlist: sweep (m, recall_target) for the fused path.

Design under test (follows probe_scores_kernel.py): Pallas int8 matmul
emits raw f32 scores; `lax.approx_max_k(scores, m, recall_target)` builds
the shortlist; a COUNT VERIFY makes the result provably exact-contract:

  t   = shortlist's J-th (here J=m) score
  c   = |{i : scores_i > t}|      (one pass over the 4 MB score vector)
  c_s = |{shortlist > t}|
  ok  ⟺ c == c_s   (every element strictly above t is in the shortlist)

On !ok, `lax.cond` falls back to exact `lax.top_k(scores, m)`. Exactness
then only rests on the int8-noise margin m (true exact-score top-20 must
lie within the int8-score top-m), the same *kind* of assumption as the
current production path's 512 margin — but structurally verified instead
of assumed (the current per-tile k_tile=80 cap can still silently miss
under >80-deep tie clustering; this design cannot).

Expected fallback rate ~ m*(-ln recall)/2; sweep measures the real one
plus p50 with the verify pass included.

Also: boundary-tie test — 240 planted exact duplicates with m=64 < 240
must still return the 20 LOWEST planted indices (tie contract), because
ties AT t are excluded from both counts and any kept subset is
interchangeable above k... verified empirically here.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_verify_shortlist.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuclip.ops.topk_int8 import (
    INT8_TILE_N,
    derive_int8_matrix_device,
    quantize_queries_device,
    round_f32_to_bf16_bits,
    topk_int8_rerank_fused,
)

N, D, K, CHAIN = 1_000_000, 1152, 20, 32
N_PAD = -(-N // INT8_TILE_N) * INT8_TILE_N
_NEG_INF = float("-inf")


def _scores_kernel(q_ref, m_ref, scales_ref, meta_ref, out_ref, *, tile_n, out_rows):
    base = pl.program_id(0) * tile_n
    acc = jax.lax.dot_general(
        q_ref[:], m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc[:out_rows].astype(jnp.float32) * scales_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    out_ref[:] = jnp.where(col < meta_ref[0, 0], scores, _NEG_INF)


def _int8_scores(qi, m_t, scales, n_valid, tile_n=INT8_TILE_N):
    q_count, d = qi.shape
    n = m_t.shape[1]
    tile = min(tile_n, n)
    num_tiles = n // tile
    q_pad = (-q_count) % 32
    if q_pad:
        qi = jnp.pad(qi, ((0, q_pad), (0, 0)))
    qp = qi.shape[0]
    out_rows = min(qp, max(8, -(-q_count // 8) * 8))
    kernel = functools.partial(_scores_kernel, tile_n=tile, out_rows=out_rows)
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
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d + qp * d + n * 4 + out_rows * n * 4,
            transcendentals=0,
        ),
    )(qi, m_t, scales.reshape(1, -1),
      jnp.reshape(n_valid.astype(jnp.int32), (1, 1)))[0]
    return scores[:q_count]


def _fused_verified(q_f32, m_t, scales, rows, n_valid, *, m, recall,
                    want_fallback_flag=False):
    qi, _ = quantize_queries_device(q_f32)
    scores = _int8_scores(qi, m_t, scales, n_valid)
    s_a, cand_a = jax.lax.approx_max_k(scores, m, recall_target=recall)
    cand_a = cand_a.astype(jnp.int32)
    t = s_a[:, m - 1][:, None]
    c = jnp.sum((scores > t), axis=1)
    c_s = jnp.sum(s_a > t, axis=1)
    ok = jnp.all((c == c_s) | jnp.isneginf(t[:, 0]))

    def exact_path(_):
        s_e, cand_e = jax.lax.top_k(scores, m)
        return s_e, cand_e.astype(jnp.int32)

    s_short, cand = jax.lax.cond(ok, lambda _: (s_a, cand_a), exact_path, None)
    safe = jnp.clip(cand, 0, N - 1)
    gathered = rows[safe].astype(jnp.float32)
    qr = round_f32_to_bf16_bits(q_f32.astype(jnp.float32))
    exact = jnp.einsum("qmd,qd->qm", gathered, qr, preferred_element_type=jnp.float32)
    invalid = jnp.isneginf(s_short) | (cand >= n_valid)
    exact = jnp.where(invalid, _NEG_INF, exact)
    sort_rows = jnp.where(invalid, jnp.iinfo(jnp.int32).max, cand)
    order = jnp.lexsort((sort_rows, -exact), axis=-1)[:, :K]
    out = (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(sort_rows, order, axis=1),
    )
    if want_fallback_flag:
        return out + (ok,)
    return out


def _chain_p50(fn, queries, *consts, samples=5):
    @jax.jit
    def chained(qs, *cs):
        def body(carry, q):
            out = fn(q + carry * 0.0, *cs)
            red = jnp.asarray(
                out[0] if isinstance(out, tuple) else out, jnp.float32
            ).reshape(-1)[0]
            return red * 0.0, red

        _, outs = jax.lax.scan(body, jnp.zeros(()), qs)
        return outs

    out = chained(queries, *consts)
    _ = np.asarray(out)
    times = []
    for _i in range(samples):
        t0 = time.perf_counter()
        out = chained(queries, *consts)
        _ = np.asarray(out)
        times.append((time.perf_counter() - t0) / CHAIN)
    return float(np.percentile(np.array(times), 50) * 1e3)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    @jax.jit
    def make_rows(k):
        r = jax.random.normal(k, (N, D), jnp.float32)
        r = r / jnp.linalg.norm(r, axis=1, keepdims=True)
        return r.astype(jnp.bfloat16)

    rows = make_rows(jax.random.PRNGKey(0))
    m_t, scales = derive_int8_matrix_device(rows, N_PAD)
    _ = np.asarray(scales[:1])
    n_valid = jnp.asarray(N, jnp.int32)
    queries = jnp.asarray(
        np.random.default_rng(0).standard_normal((CHAIN, 1, D)).astype(np.float32)
    )
    print("resident data ready", flush=True)

    # Reference outputs for 64 random queries + fallback-rate measurement.
    qmany = jnp.asarray(
        np.random.default_rng(7).standard_normal((64, D)).astype(np.float32)
    )
    s_ref, i_ref = jax.jit(
        lambda q, mt, sc, rw, nv: topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
    )(qmany, m_t, scales, rows, n_valid)
    i_ref = np.asarray(i_ref)

    for m, recall in [(512, 0.95), (64, 0.999), (128, 0.999), (128, 0.9995),
                      (256, 0.999)]:
        fb = 0
        agree_all = 1.0
        # per-query fallback flags (batch of 1 so ok is per-query)
        fn_flag = jax.jit(
            lambda q, mt, sc, rw, nv, _m=m, _r=recall: _fused_verified(
                q, mt, sc, rw, nv, m=_m, recall=_r, want_fallback_flag=True
            )
        )
        for qq in range(64):
            s_n, i_n, ok = fn_flag(
                qmany[qq:qq + 1], m_t, scales, rows, n_valid
            )
            fb += int(not bool(np.asarray(ok)))
            agree_all = min(
                agree_all, float((np.asarray(i_n)[0] == i_ref[qq]).mean())
            )
        fn = lambda q, mt, sc, rw, nv, _m=m, _r=recall: _fused_verified(  # noqa: E731
            q, mt, sc, rw, nv, m=_m, recall=_r
        )[0].max()
        ms = _chain_p50(fn, queries, m_t, scales, rows, n_valid)
        print(
            f"m={m:4d} recall={recall:6.4f}  p50={ms:7.3f} ms  "
            f"fallback {fb}/64  min-agreement {agree_all:.4f}",
            flush=True,
        )

    # Boundary ties: 240 exact duplicates, m=64 < 240.
    tie_rows = np.asarray(rows[:8192], np.float32)
    winner = tie_rows[7] / np.linalg.norm(tie_rows[7])
    tie_idx = np.arange(13, 13 + 240 * 29, 29)
    tie_rows[tie_idx] = winner
    tie_rows /= np.linalg.norm(tie_rows, axis=1, keepdims=True)
    trows = jnp.asarray(tie_rows, jnp.bfloat16)
    t_pad = -(-8192 // INT8_TILE_N) * INT8_TILE_N
    tm_t, tscales = derive_int8_matrix_device(trows, t_pad)
    tq = jnp.asarray(winner[None, :], jnp.float32)
    for m in (64, 128):
        _, ti, ok = jax.jit(
            lambda q, mt, sc, rw, nv, _m=m: _fused_verified(
                q, mt, sc, rw, nv, m=_m, recall=0.999, want_fallback_flag=True
            )
        )(tq, tm_t, tscales, trows, jnp.asarray(8192, jnp.int32))
        got = np.sort(np.asarray(ti)[0])
        expect = np.sort(np.sort(np.concatenate([[7], tie_idx]))[:K])
        okc = bool((got == expect).all())
        print(
            f"boundary-tie m={m}: contract {'PASS' if okc else 'FAIL'} "
            f"(verify ok={bool(np.asarray(ok))})",
            flush=True,
        )
        if not okc:
            print(f"  got  {got}\n  want {expect}", flush=True)


if __name__ == "__main__":
    main()
