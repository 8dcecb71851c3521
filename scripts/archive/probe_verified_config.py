"""Pick the (shortlist m, recall_target) default for the PRODUCTION
verified fused program (ops/topk_int8.topk_int8_rerank_fused,
shortlist_method="verified").

Context: the shipped config (m=512, r=0.95, verify depth J=80) measures
ok rate 0.906 at 1M x 1152 — 9.4% of single queries pay the extract-kernel
re-run (~2x the fused p50). probe_verify_shortlist.py showed approx_max_k
at recall 0.999 loses NO candidates at shallow m, but measured with an
in-program lax.cond (both branches execute on this backend), so its p50s
don't transfer. This probe measures the real production program: chain-slope
device p50 (bench._chained_slope) + proof-pass rate over independent
queries + exact-agreement spot check.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_verified_config.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from tpuclip.ops.topk_int8 import topk_int8_rerank_fused

N, D, K, CHAIN, OKQ = 1_000_000, 1152, 20, 32, 192

# Two sweeps (select with PROBE_SET=base|deep, default deep — base was
# measured 2026-08-19, results in docs/benchmarks.md):
# - base: the original (m, recall_target) grid around the shipped default.
# - deep: deeper shortlist m at the SHIPPED recall — the r=0.999 cost blowup
#   came from the per-bin candidate inflation the recall target forces, not
#   from m itself; a deeper shortlist at r=0.95 may buy proof-pass rate at a
#   fraction of that cost (J stays 4k=80, so ok ⟺ true top-80 coverage).
CONFIG_SETS = {
    "base": [
        (512, 0.95),    # shipped default (r3 shortlist redesign)
        (512, 0.999),
        (256, 0.999),
        (128, 0.999),
        (128, 0.9995),
    ],
    "deep": [
        (512, 0.95),    # anchor
        (768, 0.95),
        (1024, 0.95),
        (2048, 0.95),
        (1024, 0.98),
    ],
}
_PROBE_SET = os.environ.get("PROBE_SET", "deep")
if _PROBE_SET not in CONFIG_SETS:
    raise SystemExit(
        f"PROBE_SET={_PROBE_SET!r} unknown; valid: {sorted(CONFIG_SETS)}"
    )
CONFIGS = CONFIG_SETS[_PROBE_SET]


def main():
    print(f"backend: {jax.default_backend()}")
    p = bench._device_prep(jax, N, D)
    rng = np.random.default_rng(7)
    queries = jnp.asarray(rng.standard_normal((CHAIN, 1, D), dtype=np.float32))
    ok_q = jnp.asarray(rng.standard_normal((OKQ, 1, D), dtype=np.float32))
    consts = (p["mq"], p["scales"], p["rows"], p["n_valid"])
    print("resident data ready")

    # Exact oracle for agreement checks (scores + lax.top_k shortlist)
    def run(q, m, r, method):
        return topk_int8_rerank_fused(
            q, p["mq"], p["scales"], p["rows"], K, shortlist=m,
            n_valid=p["n_valid"], use_pallas=True, shortlist_method=method,
            shortlist_recall=r,
        )

    for m, r in CONFIGS:
        def step(carry, q, mq, scales, rows, n_valid, m=m, r=r):
            q = q + carry * 0.0
            s, i, ok = topk_int8_rerank_fused(
                q, mq, scales, rows, K, shortlist=m, n_valid=n_valid,
                use_pallas=True, shortlist_method="verified",
                shortlist_recall=r,
            )
            return jnp.max(s), (s, i, ok)

        p50, amort = bench._chained_slope(
            jax, step, queries, CHAIN, jnp.zeros((), jnp.float32),
            consts=consts,
        )
        oks = 0
        agree = True
        for i in range(OKQ):
            s, ix, ok = run(ok_q[i], m, r, "verified")
            ok = bool(np.asarray(ok))
            oks += int(ok)
            if ok and i < 16:  # spot-check the proof's promise
                se, ie = run(ok_q[i], m, r, "exact")
                agree &= np.array_equal(np.asarray(ix), np.asarray(ie))
                agree &= np.allclose(np.asarray(s), np.asarray(se))
        print(
            f"m={m:4d} r={r:.4f}  device p50={p50:7.3f} ms "
            f"(amortized {amort:6.3f})  ok {oks}/{OKQ} = {oks / OKQ:.3f}  "
            f"exact-agreement {'PASS' if agree else 'FAIL'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
