#!/usr/bin/env python3
"""On-hardware kernel validation, machine-readable.

The pytest suite exercises the Pallas kernels in interpreter mode on CPU;
this script validates the COMPILED Mosaic kernels on the real chip against
fp64/numpy oracles and records the outcome as JSON so hardware regressions
fail a stored check instead of relying on session memory. Run whenever
kernels change:

    PYTHONPATH=. python scripts/tpu_validate.py [--out TPU_VALIDATE_rNN.json]

Exit code = number of failed checks. JSON shape:
    {"backend": "...", "ok": bool, "checks": [{"name", "ok", ...metrics}]}
"""

import argparse
import json
import time

import numpy as np


def main(out_path: str) -> int:
    import jax
    import jax.numpy as jnp

    from tpuclip.ops.hamming import binary_topk_packed, pack_bits_to_words
    from tpuclip.ops.topk import pad_matrix_t, topk_pallas, topk_xla
    from tpuclip.ops.topk_int8 import (
        INT8_TILE_N,
        quantize_matrix_t,
        quantize_query,
        topk_int8_pallas,
        topk_int8_xla,
    )

    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend != "tpu":
        print("WARNING: not on TPU — validating whatever backend is active")
    checks = []

    def record(name: str, ok: bool, **metrics):
        checks.append({"name": name, "ok": bool(ok), **metrics})
        detail = " ".join(f"{k}={v}" for k, v in metrics.items())
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")

    for n, q_count, k in [(50_000, 1, 20), (100_000, 3, 7), (30_000, 8, 128)]:
        m = rng.standard_normal((n, 256)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = rng.standard_normal((q_count, 256)).astype(np.float32)
        mt, nv = pad_matrix_t(m.T.copy())
        mt_dev = jnp.asarray(mt, jnp.bfloat16)
        nv_dev = jnp.asarray(nv, jnp.int32)
        s, i = topk_pallas(jnp.asarray(q, jnp.bfloat16), mt_dev, k, n_valid=nv_dev)
        s2, i2 = topk_xla(jnp.asarray(q, jnp.bfloat16), mt_dev, k, n_valid=nv_dev)
        agree = float(np.mean(np.asarray(i) == np.asarray(i2)))
        exact = m.astype(np.float64) @ q.astype(np.float64).T
        recall = float(np.mean([
            len(set(np.asarray(i)[r]) & set(np.argsort(-exact[:, r])[:k])) / k
            for r in range(q_count)
        ]))
        record(
            f"pallas_bf16_topk_n{n}_q{q_count}_k{k}",
            agree == 1.0 and recall >= 0.99,
            idx_agree_with_xla=round(agree, 4),
            recall_vs_fp64=round(recall, 4),
        )

    m = rng.standard_normal((60_000, 1152)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    mt, nv = pad_matrix_t(m.T.copy(), tile_n=INT8_TILE_N)
    mq, scales = quantize_matrix_t(mt)
    qi, qs = quantize_query(rng.standard_normal((1, 1152)).astype(np.float32))
    args = (jnp.asarray(qi), jnp.asarray(mq), jnp.asarray(scales),
            jnp.asarray(qs, jnp.float32), 20)
    s1, i1 = topk_int8_pallas(*args, n_valid=jnp.asarray(nv, jnp.int32))
    s2, i2 = topk_int8_xla(*args, n_valid=jnp.asarray(nv, jnp.int32))
    record(
        "int8_pallas_vs_xla",
        np.array_equal(np.asarray(i1), np.asarray(i2))
        and np.allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5),
        idx_equal=bool(np.array_equal(np.asarray(i1), np.asarray(i2))),
    )

    # Fused int8 scan + exact rescore: indices AND scores must match the
    # full-precision bf16 scan exactly (the rescore uses the same
    # bf16-in/f32-accumulate dot as topk_pallas).
    from tpuclip.ops.topk_int8 import topk_int8_rerank_fused

    rows_dev = jnp.asarray(m, jnp.bfloat16)
    qf = rng.standard_normal((2, 1152)).astype(np.float32)
    sf, if_ = topk_int8_rerank_fused(
        jnp.asarray(qf), jnp.asarray(mq), jnp.asarray(scales), rows_dev, 20,
        n_valid=jnp.asarray(nv, jnp.int32), use_pallas=backend == "tpu",
    )
    sref, iref = topk_pallas(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(mt, jnp.bfloat16), 20,
        n_valid=jnp.asarray(nv, jnp.int32),
    ) if backend == "tpu" else topk_xla(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(mt, jnp.bfloat16), 20,
        n_valid=jnp.asarray(nv, jnp.int32),
    )
    record(
        "int8_fused_rerank_vs_bf16_scan",
        np.array_equal(np.asarray(if_), np.asarray(iref))
        and np.allclose(np.asarray(sf), np.asarray(sref), rtol=1e-5, atol=1e-6),
        idx_equal=bool(np.array_equal(np.asarray(if_), np.asarray(iref))),
    )

    bits = rng.integers(0, 2, (40_000, 1152), dtype=np.uint8)
    qb = rng.integers(0, 2, (1, 1152), dtype=np.uint8)
    s, i = binary_topk_packed(
        jnp.asarray(pack_bits_to_words(qb)), jnp.asarray(pack_bits_to_words(bits)), 15
    )
    want = bits @ qb[0].astype(np.int32)
    order = np.lexsort((np.arange(len(want)), -want))[:15]
    record("packed_binary_exact", np.array_equal(np.asarray(i)[0], order))

    from tpuclip.ops.hamming import binary_topk_packed_pallas, pad_words_t

    wt, nv = pad_words_t(pack_bits_to_words(bits))
    sp, ip = binary_topk_packed_pallas(
        jnp.asarray(pack_bits_to_words(qb)), jnp.asarray(wt), 15,
        n_valid=jnp.asarray(nv, jnp.int32),
    )
    record(
        "packed_binary_pallas_grouped_exact",
        np.array_equal(np.asarray(ip)[0], order)
        and np.array_equal(np.asarray(sp)[0], want[order]),
    )

    failures = sum(not c["ok"] for c in checks)
    result = {
        "backend": backend,
        "ok": failures == 0,
        "failures": failures,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "checks": checks,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(("ALL PASSED" if failures == 0 else f"{failures} FAILURES") + f" -> {out_path}")
    return failures


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="TPU_VALIDATE.json")
    raise SystemExit(main(p.parse_args().out))
