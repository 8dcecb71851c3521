"""Stage-by-stage timing of the fused int8 search program.

The hardware bench reads ~2.5 ms for the bare int8 scan+merge
(`int8_p50_ms`) but ~4.26 ms for the full fused scan+rescore headline —
this probe isolates where the extra ~1.7 ms goes by compiling cumulative
prefixes of `topk_int8_rerank_fused` (tpuclip/ops/topk_int8.py:403) as
standalone programs over the same resident 1M x 1152 index:

  scan        per-tile packed-key extraction only (Pallas kernel)
  merge       + global top-`shortlist` merge (jax.lax.top_k over keys)
  gather      + rows_full[cand] gather of the shortlist
  rescore     + f32 einsum exact rescore
  full        + invalid masking + (score desc, idx asc) lexsort  [= fused]

Timing protocol mirrors bench.py's `_chained_p50`: a jitted `lax.scan`
over `chain` queries with a carry coupling to force sequential execution,
consts threaded as real jit arguments, and a HOST FETCH as the barrier
(`jax.block_until_ready` does not block on the axon tunnel backend).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fused_overhead.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuclip.ops.topk_int8 import (
    INT8_TILE_N,
    _IDX_MASK,
    _NEGINF_KEY_MAX,
    _int8_candidates_packed,
    derive_int8_matrix_device,
    quantize_queries_device,
    round_f32_to_bf16_bits,
    topk_int8_rerank_fused,
)

N, D, K, SHORTLIST, CHAIN = 1_000_000, 1152, 20, 512, 32
N_PAD = -(-N // INT8_TILE_N) * INT8_TILE_N


def _stage(q_f32, m_t, scales, rows, n_valid, *, upto: str, shortlist=SHORTLIST):
    qi, _ = quantize_queries_device(q_f32)
    m = min(max(shortlist, 4 * K), N)
    num_tiles = N_PAD // INT8_TILE_N
    k_tile = min(128, max(4 * K, 2 * (-(-m // num_tiles))))
    keys = _int8_candidates_packed(
        qi, m_t, scales, k_tile, n_valid, INT8_TILE_N, False
    )[: q_f32.shape[0]]
    if upto == "scan":
        return keys.max()
    k_pad = -(-k_tile // 128) * 128
    m = min(m, keys.shape[1])
    top_keys, pos = jax.lax.top_k(keys, m)
    u = jax.lax.bitcast_convert_type(top_keys, jnp.uint32) ^ jnp.uint32(0x80000000)
    local = (jnp.uint32(_IDX_MASK) - (u & jnp.uint32(_IDX_MASK))).astype(jnp.int32)
    cand = (pos // k_pad) * INT8_TILE_N + local
    cand_invalid = top_keys <= jnp.int32(_NEGINF_KEY_MAX)
    if upto == "merge":
        return cand.max()
    safe = jnp.clip(cand, 0, N - 1)
    gathered = rows[safe].astype(jnp.float32)
    if upto == "gather":
        return gathered.sum()
    qr = round_f32_to_bf16_bits(q_f32.astype(jnp.float32))
    exact = jnp.einsum("qmd,qd->qm", gathered, qr, preferred_element_type=jnp.float32)
    if upto == "rescore":
        return exact.max()
    invalid = (cand < 0) | (cand >= N) | cand_invalid
    exact = jnp.where(invalid, -jnp.inf, exact)
    sort_rows = jnp.where(invalid, jnp.iinfo(jnp.int32).max, cand)
    order = jnp.lexsort((sort_rows, -exact), axis=-1)[:, :K]
    return jnp.take_along_axis(exact, order, axis=1).max()


def _chain_p50(fn, queries, *consts, samples=5):
    """bench.py `_chained_p50` protocol: lax.scan chain + host-fetch barrier."""

    @jax.jit
    def chained(qs, *cs):
        def body(carry, q):
            out = fn(q + carry * 0.0, *cs)
            red = jnp.asarray(out, jnp.float32).reshape(-1)[0]
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
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_rows(k):
        r = jax.random.normal(k, (N, D), jnp.float32)
        r = r / jnp.linalg.norm(r, axis=1, keepdims=True)
        return r.astype(jnp.bfloat16)

    rows = make_rows(key)
    m_t, scales = derive_int8_matrix_device(rows, N_PAD)
    _ = np.asarray(scales[:1])  # barrier
    n_valid = jnp.asarray(N, jnp.int32)
    queries = jnp.asarray(
        np.random.default_rng(0).standard_normal((CHAIN, 1, D)).astype(np.float32)
    )
    print("resident data ready", flush=True)

    baseline = None
    for stage in ("scan", "merge", "gather", "rescore", "full"):
        fn = functools.partial(_stage, upto=stage)
        ms = _chain_p50(fn, queries, m_t, scales, rows, n_valid)
        delta = "" if baseline is None else f"  (+{ms - baseline:.3f} ms)"
        print(f"{stage:8s} {ms:7.3f} ms{delta}", flush=True)
        baseline = ms

    def entry(q, mt, sc, rw, nv):
        s, _ = topk_int8_rerank_fused(q, mt, sc, rw, K, n_valid=nv)
        return s.max()

    ms = _chain_p50(entry, queries, m_t, scales, rows, n_valid)
    print(f"{'entry':8s} {ms:7.3f} ms  (topk_int8_rerank_fused)", flush=True)

    for sl in (128, 256, 1024):
        def entry_sl(q, mt, sc, rw, nv, _sl=sl):
            s, _ = topk_int8_rerank_fused(q, mt, sc, rw, K, shortlist=_sl, n_valid=nv)
            return s.max()

        ms = _chain_p50(entry_sl, queries, m_t, scales, rows, n_valid)
        print(f"shortlist={sl:4d} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
