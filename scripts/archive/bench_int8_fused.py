"""Measure the fused int8-scan -> exact-rescore path on the real chip.

Compares, at 1M x 1152 on one TPU:
  int8_scan           — topk_int8_pallas alone (round-1 path before host rerank)
  int8_fused          — topk_int8_rerank_fused with packed-key extraction
                        (production default)
  int8_fused_unpacked — same fused program with the (score, idx)-pair kernel
  bf16_full           — topk_pallas full-precision scan (reference)

Chained-scan methodology as bench.py._chained_p50 (per-call tunnel RPC would
swamp single-digit-ms kernels). All device-resident arrays are threaded as
jit ARGUMENTS — a closure capture ships them as lowered constants through
the remote-compile tunnel and wedges it (docs/benchmarks.md, round-3
root-cause).

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
    topk_int8_xla,
)
from tpuclip.ops.topk import topk_xla

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K, CHAIN = 1152, 20, 32


def chained(step, queries, consts):
    """step(carry, q, *consts) -> (carry, (s, i)); consts are jit args."""

    @jax.jit
    def run(queries, *consts):
        def body(carry, q):
            return step(carry, q, *consts)

        _, outs = jax.lax.scan(body, jnp.zeros((), jnp.float32), queries)
        return outs

    out = run(queries, *consts)
    jax.block_until_ready(out)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(queries, *consts)
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
    print(f"backend={jax.default_backend()} n={N}", flush=True)
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
    print("device data ready", flush=True)

    q_host = rng.standard_normal((CHAIN, 1, D), dtype=np.float32)
    q_host /= np.linalg.norm(q_host, axis=-1, keepdims=True)
    queries_f32 = jnp.asarray(q_host)
    qi_host = np.stack([quantize_query(q)[0] for q in q_host])
    queries_i8 = jnp.asarray(qi_host)
    queries_bf = jnp.asarray(q_host, dtype=dtype)

    qs_one = jnp.asarray(1.0, jnp.float32)

    def step_scan(carry, q, mq_d, scales_d, n_valid):
        q = (q.astype(jnp.float32) + carry * 0.0).astype(q.dtype)
        fn = topk_int8_pallas if on_tpu else topk_int8_xla
        s, i = fn(q, mq_d, scales_d, qs_one, K, n_valid=n_valid)
        return jnp.max(s), (s, i)

    ms, _ = chained(step_scan, queries_i8, (mq_d, scales_d, n_valid))
    print(f"int8_scan   p50 {ms:.3f} ms", flush=True)

    def step_fused(carry, q, mq_d, scales_d, rows_d, n_valid, *, packed=True):
        q = q + carry * 0.0
        s, i = topk_int8_rerank_fused(
            q, mq_d, scales_d, rows_d, K, n_valid=n_valid, use_pallas=on_tpu,
            use_packed=packed,
        )
        return jnp.max(s), (s, i)

    ms_f, out_f = chained(
        step_fused, queries_f32, (mq_d, scales_d, rows_d, n_valid)
    )
    print(f"int8_fused  p50 {ms_f:.3f} ms   (packed-key extraction)", flush=True)

    import functools

    ms_u, out_u = chained(
        functools.partial(step_fused, packed=False),
        queries_f32, (mq_d, scales_d, rows_d, n_valid),
    )
    print(f"int8_fused_unpacked p50 {ms_u:.3f} ms", flush=True)
    same = np.array_equal(np.asarray(out_f[1]), np.asarray(out_u[1]))
    print(f"packed == unpacked results: {same}", flush=True)

    def step_bf16(carry, q, matrix_bf16, n_valid):
        q = q + carry * 0.0
        fn = topk_pallas if on_tpu else topk_xla
        s, i = fn(q, matrix_bf16, K, n_valid=n_valid)
        return jnp.max(s.astype(jnp.float32)), (s, i)

    ms_b, out_b = chained(step_bf16, queries_bf, (matrix_bf16, n_valid))
    print(f"bf16_full   p50 {ms_b:.3f} ms", flush=True)

    # agreement: fused indices vs bf16-scan indices on the chain's queries
    i_f = np.asarray(out_f[1]).reshape(CHAIN, K)
    i_b = np.asarray(out_b[1]).reshape(CHAIN, K)
    agree = float((i_f == i_b).mean())
    print(f"fused-vs-bf16 index agreement: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
