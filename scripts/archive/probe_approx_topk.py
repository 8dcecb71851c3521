"""Can `lax.approx_max_k` replace the in-kernel per-tile extraction?

probe_fused_overhead.py showed the fused path's cost lives in the scan
kernel's k_tile=80 extraction rounds (~1.5 ms of VPU max-and-mask at 1M
rows), not in merge/gather/rescore (+0.16 ms combined). The raw scores for
one query over 1M rows are only 4 MB — materializing them and shortlisting
with the TPU-native PartialReduce (jax.lax.approx_max_k) would delete the
extraction rounds entirely.

Variants timed (1M x 1152, k=20, shortlist 512, chain=32):

  pallas_now     current production entry (topk_int8_rerank_fused)
  xla_scores     int8 XLA matmul -> f32 scores -> approx_max_k(512)
                 -> gather -> exact rescore -> lexsort   [candidate design]
  xla_scan_only  int8 XLA matmul -> approx_max_k(512) only (scan cost floor)
  xla_exact_topk int8 XLA matmul -> lax.top_k(512)   (why Pallas was built)

Also checks shortlist agreement of xla_scores vs the current entry.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_approx_topk.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

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


def _xla_fused(q_f32, m_t, scales, rows, n_valid, *, upto="full", recall=0.95):
    qi, _ = quantize_queries_device(q_f32)
    acc = jax.lax.dot_general(
        qi, m_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * scales[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m_t.shape[1]), 1)
    scores = jnp.where(col < n_valid, scores, _NEG_INF)
    if upto == "exact_topk":
        s, i = jax.lax.top_k(scores, SHORTLIST)
        return s.max()
    s, cand = jax.lax.approx_max_k(scores, SHORTLIST, recall_target=recall)
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

    # Correctness first: does the XLA+approx path return the same top-20?
    q0 = queries[:1].reshape(1, D)
    s_ref, i_ref = jax.jit(
        lambda q, mt, sc, rw, nv: topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
    )(q0, m_t, scales, rows, n_valid)
    s_new, i_new = jax.jit(
        lambda q, mt, sc, rw, nv: _xla_fused(q, mt, sc, rw, nv)
    )(q0, m_t, scales, rows, n_valid)
    i_ref, i_new = np.asarray(i_ref), np.asarray(i_new)
    agree = float((i_ref == i_new).mean())
    print(f"top-{K} index agreement vs current entry: {agree:.4f}", flush=True)
    print(f"score max abs diff: {np.abs(np.asarray(s_ref)-np.asarray(s_new)).max():.2e}",
          flush=True)

    def entry(q, mt, sc, rw, nv):
        s, _ = topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
        return s.max()

    for name, fn in [
        ("pallas_now", entry),
        ("xla_scores", lambda q, mt, sc, rw, nv: _xla_fused(q, mt, sc, rw, nv)),
        ("xla_scan_only", lambda q, mt, sc, rw, nv: _xla_fused(q, mt, sc, rw, nv, upto="scan_only")),
        ("xla_exact_topk", lambda q, mt, sc, rw, nv: _xla_fused(q, mt, sc, rw, nv, upto="exact_topk")),
    ]:
        try:
            ms = _chain_p50(fn, queries, m_t, scales, rows, n_valid)
            print(f"{name:15s} {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and continues
            print(f"{name:15s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
