"""Hybrid shortlist design: Pallas int8 matmul emitting RAW SCORES +
`lax.approx_max_k` outside the kernel.

probe_approx_topk.py showed approx_max_k is cheap and exact-agreeing on
this backend, but XLA's own int8 matmul is ~1.4 ms slower than the Pallas
kernel. This probe pairs the Pallas matmul (scores written to HBM — 4 MB/
query at 1M rows, negligible vs the 1.15 GB matrix read) with the
PartialReduce shortlist, deleting the k_tile extraction rounds that cost
the current fused path ~1.5 ms.

Variants (1M x 1152, k=20, shortlist 512, chain=32):

  pallas_now      current production entry (k_tile=80 in-kernel extraction)
  scores_approx   scores kernel + approx_max_k + gather/rescore/lexsort
  scores_only     scores kernel + approx_max_k (floor, no rescore)
  batch16         scores_approx at q=16 (serve micro-batch group)

Adversarial-tie check: 240 byte-identical rows planted; the tie contract
(score desc, idx asc) demands the 20 LOWEST row indices — verifies whether
PartialReduce's bin-max keeps lower positions on ties.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_scores_kernel.py
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

N, D, K, SHORTLIST, CHAIN = 1_000_000, 1152, 20, 512, 32
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


def _fused_scores(q_f32, m_t, scales, rows, n_valid, *, upto="full"):
    qi, _ = quantize_queries_device(q_f32)
    scores = _int8_scores(qi, m_t, scales, n_valid)
    s, cand = jax.lax.approx_max_k(scores, SHORTLIST)
    if upto == "scan_only":
        return s.max()
    cand = cand.astype(jnp.int32)
    safe = jnp.clip(cand, 0, N - 1)
    gathered = rows[safe].astype(jnp.float32)
    qr = round_f32_to_bf16_bits(q_f32.astype(jnp.float32))
    exact = jnp.einsum("qmd,qd->qm", gathered, qr, preferred_element_type=jnp.float32)
    invalid = jnp.isneginf(s) | (cand >= n_valid)
    exact = jnp.where(invalid, _NEG_INF, exact)
    sort_rows = jnp.where(invalid, jnp.iinfo(jnp.int32).max, cand)
    order = jnp.lexsort((sort_rows, -exact), axis=-1)[:, :K]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(sort_rows, order, axis=1),
    )


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

    # Correctness vs current entry on random data.
    q0 = queries[:1].reshape(1, D)
    s_ref, i_ref = jax.jit(
        lambda q, mt, sc, rw, nv: topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
    )(q0, m_t, scales, rows, n_valid)
    s_new, i_new = jax.jit(
        lambda q, mt, sc, rw, nv: _fused_scores(q, mt, sc, rw, nv)
    )(q0, m_t, scales, rows, n_valid)
    agree = float((np.asarray(i_ref) == np.asarray(i_new)).mean())
    print(f"random-data top-{K} agreement vs current: {agree:.4f}", flush=True)

    # Adversarial ties: plant 240 copies of one row; contract = 20 LOWEST idx.
    tie_rows = np.asarray(rows[:4096], np.float32)
    winner = tie_rows[7] / np.linalg.norm(tie_rows[7])
    tie_idx = np.arange(13, 13 + 240 * 17, 17)
    tie_rows[tie_idx] = winner
    tie_rows /= np.linalg.norm(tie_rows, axis=1, keepdims=True)
    trows = jnp.asarray(tie_rows, jnp.bfloat16)
    t_pad = -(-4096 // INT8_TILE_N) * INT8_TILE_N
    tm_t, tscales = derive_int8_matrix_device(trows, t_pad)
    tq = jnp.asarray(winner[None, :], jnp.float32)
    _, ti = jax.jit(
        lambda q, mt, sc, rw, nv: _fused_scores(q, mt, sc, rw, nv)
    )(tq, tm_t, tscales, trows, jnp.asarray(4096, jnp.int32))
    got = np.sort(np.asarray(ti)[0])
    want = np.sort(np.concatenate([[7], tie_idx]))[:K + 1]
    # the winner row itself (idx 7) plus the 19 lowest planted copies
    expect = np.sort(want[:K])
    ok = bool((got == expect).all())
    print(f"adversarial-tie contract (240 exact ties): {'PASS' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        print(f"  got   {got[:10]}...\n  want  {expect[:10]}...", flush=True)

    def entry(q, mt, sc, rw, nv):
        s, _ = topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
        return s.max()

    for name, fn in [
        ("pallas_now", entry),
        ("scores_approx", lambda q, mt, sc, rw, nv: _fused_scores(q, mt, sc, rw, nv)),
        ("scores_only", lambda q, mt, sc, rw, nv: _fused_scores(q, mt, sc, rw, nv, upto="scan_only")),
    ]:
        ms = _chain_p50(fn, queries, m_t, scales, rows, n_valid)
        print(f"{name:14s} {ms:7.3f} ms", flush=True)

    # Batch 16 comparison.
    q16 = jnp.asarray(
        np.random.default_rng(2).standard_normal((CHAIN, 16, D)).astype(np.float32)
    )

    def entry16(q, mt, sc, rw, nv):
        s, _ = topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
        return s.max()

    ms = _chain_p50(entry16, q16, m_t, scales, rows, n_valid)
    print(f"{'pallas_now@16':14s} {ms:7.3f} ms", flush=True)
    ms = _chain_p50(
        lambda q, mt, sc, rw, nv: _fused_scores(q, mt, sc, rw, nv),
        q16, m_t, scales, rows, n_valid,
    )
    print(f"{'scores@16':14s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
