#!/usr/bin/env python3
"""Batched-query shortlist A/B: can the scores+approx(+verify) path beat
the in-kernel extract path at q=16/64?

Context (r4): batch64 runs 11.2 ms via "extract" (~103 GB/s effective vs
the single-query verified path's ~460 GB/s) because the r3 policy kept
batches on extract — the all-queries verify bit makes a batch fallback
near-certain at default shortlist depth (P(all 64 pass) ≈ 0.9^64), and
the resident-scores batched exact top_k fallback is catastrophically
slow. The candidates here: deeper shortlists / higher recall targets
(amortized over the batch, the extra rescore is cheap) with an
extract-re-run fallback, whose expected cost wins whenever
  t_verified + P_fail * t_extract < t_extract.

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_batch_topk.py
"""

import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location("benchmod", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
sys.modules["benchmod"] = bench
_spec.loader.exec_module(bench)


def main():
    import jax
    import jax.numpy as jnp

    from tpuclip.ops.topk_int8 import topk_int8_rerank_fused

    n = int(os.environ.get("PROBE_N", 1_000_000))
    d = 1152
    k = 20
    chain = int(os.environ.get("PROBE_CHAIN", 8))
    use_pallas = jax.default_backend() == "tpu"
    p = bench._device_prep(jax, n, d)
    rng = np.random.default_rng(17)
    out = {"n": n, "k": k}

    def step_for(q_batch, method, shortlist, recall):
        def step(carry, q, mq, scales, rows, n_valid):
            q = q + carry * 0.0
            res = topk_int8_rerank_fused(
                q, mq, scales, rows, k, shortlist=shortlist,
                n_valid=n_valid, use_pallas=use_pallas,
                shortlist_method=method, shortlist_recall=recall,
            )
            s = res[0]
            return jnp.max(s), (s, res[1])
        return step

    consts = (p["mq"], p["scales"], p["rows"], p["n_valid"])

    for q_batch in (16, 64):
        queries = jnp.asarray(
            rng.standard_normal((chain, q_batch, d)).astype(np.float32)
        )
        for method, shortlist, recall in [
            ("extract", 512, None),
            ("approx", 512, None),
            ("approx", 2048, None),
            ("approx", 2048, 0.99),
            ("exact", 512, None),
        ]:
            name = f"q{q_batch}_{method}_m{shortlist}" + (
                f"_rt{recall}" if recall else ""
            )
            try:
                dev, amort = bench._chained_slope(
                    jax, step_for(q_batch, method, shortlist, recall),
                    queries, chain, jnp.zeros((), jnp.float32), consts=consts,
                )
                out[name + "_ms"] = round(dev, 3)
                out[name + "_qps"] = round(q_batch / dev * 1000)
                print(f"{name}: {dev:.3f} ms  ({q_batch / dev * 1000:.0f} qps)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                out[name + "_error"] = str(e)[:120]
                print(f"{name}: ERROR {e}", flush=True)

        # verified pass rates: fraction of random batches whose ALL-queries
        # proof passes, per (shortlist, recall) — decides the fallback math.
        for shortlist, recall in [(512, None), (2048, None), (2048, 0.99), (4096, None)]:
            oks = 0
            trials = 24
            for t in range(trials):
                q = jnp.asarray(
                    rng.standard_normal((q_batch, d)).astype(np.float32)
                )
                res = topk_int8_rerank_fused(
                    q, p["mq"], p["scales"], p["rows"], k,
                    shortlist=shortlist, n_valid=p["n_valid"],
                    use_pallas=use_pallas, shortlist_method="verified",
                    shortlist_recall=recall,
                )
                oks += int(bool(np.asarray(res[2])))
            key = f"q{q_batch}_verified_m{shortlist}" + (
                f"_rt{recall}" if recall else ""
            )
            out[key + "_pass_rate"] = round(oks / trials, 3)
            print(f"{key}: pass rate {oks}/{trials}", flush=True)

        # verified timing at the depth the pass rates favor
        for shortlist, recall in [(2048, None), (4096, None)]:
            name = f"q{q_batch}_verified_m{shortlist}"
            try:
                dev, _ = bench._chained_slope(
                    jax, step_for(q_batch, "verified", shortlist, recall),
                    queries, chain, jnp.zeros((), jnp.float32), consts=consts,
                )
                out[name + "_ms"] = round(dev, 3)
                print(f"{name}: {dev:.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                out[name + "_error"] = str(e)[:120]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
