"""Measure the fused int8-scan -> exact-rescore path on the real chip.

Compares, at 1M x 1152 on one TPU:
  int8_scan        — topk_int8_pallas alone (round-1 path before host rerank)
  int8_fused       — topk_int8_rerank_fused (scan + shortlist + exact rescore
                     against the resident bf16 rows, ONE device program)
  bf16_full        — topk_pallas full-precision scan (reference)

Same chained-scan methodology as bench.py (per-call tunnel RPC would swamp
single-digit-ms kernels).

Usage: python scripts/bench_int8_fused.py [N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuclip.ops.topk import pad_matrix_t, topk_pallas
from tpuclip.ops.topk_int8 import (
    quantize_matrix_t,
    quantize_query,
    topk_int8_pallas,
    topk_int8_rerank_fused,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K, CHAIN = 1152, 20, 32


def chained(fn, queries):
    @jax.jit
    def run(queries):
        def step(carry, q):
            q = q + carry * 0.0
            s, i = fn(q)
            return jnp.max(s), (s, i)

        _, outs = jax.lax.scan(step, jnp.zeros((), jnp.float32), queries)
        return outs

    out = run(queries)
    jax.block_until_ready(out)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(queries)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / CHAIN * 1e3)
    return float(np.median(samples)), out


def main():
    try:
        from tpuclip.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    host = rng.standard_normal((D, N), dtype=np.float32)
    host /= np.linalg.norm(host, axis=0, keepdims=True)
    padded, n_valid_int = pad_matrix_t(host)
    n_valid = jnp.asarray(n_valid_int, jnp.int32)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    mq, scales = quantize_matrix_t(padded)
    mq_d = jnp.asarray(mq)
    scales_d = jnp.asarray(scales)
    rows_d = jnp.asarray(host.T.copy(), dtype=dtype)
    matrix_bf16 = jnp.asarray(padded, dtype=dtype)
    jax.block_until_ready((mq_d, scales_d, rows_d, matrix_bf16))

    q_host = rng.standard_normal((CHAIN, 1, D), dtype=np.float32)
    q_host /= np.linalg.norm(q_host, axis=-1, keepdims=True)
    queries_f32 = jnp.asarray(q_host)
    qi_host = np.stack([quantize_query(q)[0] for q in q_host])
    queries_i8 = jnp.asarray(qi_host)
    queries_bf = jnp.asarray(q_host, dtype=dtype)

    qs_one = jnp.asarray(1.0, jnp.float32)

    ms, _ = chained(
        lambda q: topk_int8_pallas(q, mq_d, scales_d, qs_one, K, n_valid=n_valid)
        if on_tpu
        else __import__("tpuclip.ops.topk_int8", fromlist=["topk_int8_xla"]).topk_int8_xla(
            q, mq_d, scales_d, qs_one, K, n_valid=n_valid
        ),
        queries_i8,
    )
    print(f"int8_scan   p50 {ms:.3f} ms")

    ms_f, out_f = chained(
        lambda q: topk_int8_rerank_fused(
            q, mq_d, scales_d, rows_d, K, n_valid=n_valid, use_pallas=on_tpu
        ),
        queries_f32,
    )
    print(f"int8_fused  p50 {ms_f:.3f} ms")

    ms_b, out_b = chained(
        lambda q: topk_pallas(q, matrix_bf16, K, n_valid=n_valid)
        if on_tpu
        else __import__("tpuclip.ops.topk", fromlist=["topk_xla"]).topk_xla(
            q, matrix_bf16, K, n_valid=n_valid
        ),
        queries_bf,
    )
    print(f"bf16_full   p50 {ms_b:.3f} ms")

    # agreement: fused indices vs bf16-scan indices on the chain's queries
    i_f = np.asarray(out_f[1][1]).reshape(CHAIN, K)
    i_b = np.asarray(out_b[1][1]).reshape(CHAIN, K)
    agree = float((i_f == i_b).mean())
    print(f"fused-vs-bf16 index agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
