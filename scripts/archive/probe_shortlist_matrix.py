"""Final config matrix for the scores-kernel shortlist redesign.

Candidates (scores always from the Pallas int8 matmul kernel):

  exact      lax.top_k(scores, 512)             — provably exact shortlist
  av:m,r     approx_max_k(m, r) + verify@J=64 + lax.cond exact fallback

measured at q = 1 / 16 / 64 with per-query fallback rates (over 64 random
queries) for the av variants. Decision: simplest config that wins at q=1
without losing the batch path.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_shortlist_matrix.py
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
)

N, D, K, CHAIN, J = 1_000_000, 1152, 20, 16, 64
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
    qp_est = q_count + ((-q_count) % 32)
    if tile_n == INT8_TILE_N and qp_est > 32:
        narrower = 3072 if qp_est <= 64 else 2048
        if n % narrower == 0:
            tile_n = narrower
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


def _tail(q_f32, scores, s_short, cand, n_valid, rows):
    safe = jnp.clip(cand, 0, N - 1)
    gathered = rows[safe].astype(jnp.float32)
    qr = round_f32_to_bf16_bits(q_f32.astype(jnp.float32))
    exact = jnp.einsum("qmd,qd->qm", gathered, qr, preferred_element_type=jnp.float32)
    invalid = jnp.isneginf(s_short) | (cand >= n_valid)
    exact = jnp.where(invalid, _NEG_INF, exact)
    sort_rows = jnp.where(invalid, jnp.iinfo(jnp.int32).max, cand)
    order = jnp.lexsort((sort_rows, -exact), axis=-1)[:, :K]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(sort_rows, order, axis=1),
    )


def fused_exact(q_f32, m_t, scales, rows, n_valid, m=512):
    qi, _ = quantize_queries_device(q_f32)
    scores = _int8_scores(qi, m_t, scales, n_valid)
    s_short, cand = jax.lax.top_k(scores, m)
    return _tail(q_f32, scores, s_short, cand.astype(jnp.int32), n_valid, rows)


def fused_av(q_f32, m_t, scales, rows, n_valid, *, m, recall, flag=False):
    qi, _ = quantize_queries_device(q_f32)
    scores = _int8_scores(qi, m_t, scales, n_valid)
    s_a, cand_a = jax.lax.approx_max_k(scores, m, recall_target=recall)
    cand_a = cand_a.astype(jnp.int32)
    j = min(J, m)
    t = s_a[:, j - 1][:, None]
    above = jnp.sum(scores > t, axis=1)
    above_s = jnp.sum(s_a > t, axis=1)
    eq = jnp.sum(scores == t, axis=1)
    eq_s = jnp.sum(s_a == t, axis=1)
    ok = jnp.all(((above == above_s) & (eq == eq_s)) | jnp.isneginf(t[:, 0]))

    def exact_path(_):
        s_e, cand_e = jax.lax.top_k(scores, m)
        return s_e, cand_e.astype(jnp.int32)

    s_short, cand = jax.lax.cond(ok, lambda _: (s_a, cand_a), exact_path, None)
    out = _tail(q_f32, scores, s_short, cand, n_valid, rows)
    return out + (ok,) if flag else out


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
    rng = np.random.default_rng(0)

    variants = [
        ("exact512", lambda q, *c: fused_exact(q, *c)),
        ("av512r95", lambda q, *c: fused_av(q, *c, m=512, recall=0.95)),
        ("av512r98", lambda q, *c: fused_av(q, *c, m=512, recall=0.98)),
        ("av1024r95", lambda q, *c: fused_av(q, *c, m=1024, recall=0.95)),
    ]
    for qn in (1, 16, 64):
        queries = jnp.asarray(
            rng.standard_normal((CHAIN, qn, D)).astype(np.float32)
        )
        for name, fn in variants:
            ms = _chain_p50(fn, queries, m_t, scales, rows, n_valid)
            print(f"q={qn:2d} {name:10s} {ms:8.3f} ms"
                  f"  ({qn * 1000 / ms:7.0f} qps)", flush=True)

    # Per-query fallback rates for av variants.
    qmany = jnp.asarray(rng.standard_normal((64, D)).astype(np.float32))
    for name, m, r in [("av512r95", 512, 0.95), ("av512r98", 512, 0.98),
                       ("av1024r95", 1024, 0.95)]:
        fn = jax.jit(
            lambda q, mt, sc, rw, nv, _m=m, _r=r: fused_av(
                q, mt, sc, rw, nv, m=_m, recall=_r, flag=True
            )
        )
        fb = 0
        for qq in range(64):
            ok = fn(qmany[qq:qq + 1], m_t, scales, rows, n_valid)[2]
            fb += int(not bool(np.asarray(ok)))
        print(f"{name:10s} per-query fallback {fb}/64", flush=True)


if __name__ == "__main__":
    main()
