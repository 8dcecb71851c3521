#!/usr/bin/env python3
"""Blockwise-EXACT top-k over materialized int8 scores: can it replace the
extract kernel for batches (and maybe the approx+verify dance entirely)?

Identity: any true global top-k item is a top-k item of its block, so
  scores (Q, N) -> reshape (Q, NB, B) -> top_k(B -> k) per block
  -> flatten (Q, NB*k) candidates -> final top_k -> k
is EXACT, with no PartialReduce recall caveat and no proof/fallback. The
question is only whether XLA's batched top_k over width-B blocks is fast
where its top_k over width-N collapses (q64/N=1M measured 99 ms, r4
probe_batch_topk).

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_blockwise_topk.py
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

    from tpuclip.ops.topk_int8 import (
        int8_scores_pallas,
        quantize_queries_device,
    )

    n = int(os.environ.get("PROBE_N", 1_000_000))
    d = 1152
    k = 20
    chain = int(os.environ.get("PROBE_CHAIN", 8))
    use_pallas = jax.default_backend() == "tpu"
    p = bench._device_prep(jax, n, d)
    n_pad = p["mq"].shape[1]
    rng = np.random.default_rng(23)
    out = {"n": n, "n_pad": n_pad, "k": k}
    consts = (p["mq"], p["scales"], p["rows"], p["n_valid"])

    def scores_of(q, mq, scales, n_valid):
        qi, qs = quantize_queries_device(q)
        if use_pallas:
            s = int8_scores_pallas(qi, mq, scales, n_valid)
        else:
            from tpuclip.ops.topk_int8 import _int8_scores_xla

            s = _int8_scores_xla(qi, mq, scales, n_valid)
        return s, qs

    def step_scores_only(carry, q, mq, scales, rows, n_valid):
        q = q + carry * 0.0
        s, _ = scores_of(q, mq, scales, n_valid)
        return jnp.max(s), s

    def blockwise_step(block):
        nb = n_pad // block

        def step(carry, q, mq, scales, rows, n_valid):
            q = q + carry * 0.0
            s, qs = scores_of(q, mq, scales, n_valid)
            qn = s.shape[0]
            sb = s.reshape(qn, nb, block)
            bs, bi = jax.lax.top_k(sb, k)            # (Q, NB, k)
            base = (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
            cand_i = (bi.astype(jnp.int32) + base).reshape(qn, nb * k)
            cand_s = bs.reshape(qn, nb * k)
            fs, fi = jax.lax.top_k(cand_s, k)        # (Q, k)
            idx = jnp.take_along_axis(cand_i, fi, axis=1)
            return jnp.max(fs), (fs * qs, idx)

        return step

    def blockwise_argmax_step(block, rounds):
        """k rounds of per-block argmax+mask: no sort at all; exact if
        rounds >= k only when each block contributes <= rounds items —
        NOT exact in general, measured for cost reference only."""
        nb = n_pad // block

        def step(carry, q, mq, scales, rows, n_valid):
            q = q + carry * 0.0
            s, qs = scores_of(q, mq, scales, n_valid)
            qn = s.shape[0]
            sb = s.reshape(qn, nb, block)
            outs, outi = [], []
            cur = sb
            for _ in range(rounds):
                m = jnp.argmax(cur, axis=2)
                v = jnp.max(cur, axis=2)
                outs.append(v)
                outi.append(m.astype(jnp.int32))
                cur = cur.at[
                    jnp.arange(qn)[:, None], jnp.arange(nb)[None, :], m
                ].set(-jnp.inf)
            cand_s = jnp.stack(outs, 2).reshape(qn, nb * rounds)
            cand_i = (
                jnp.stack(outi, 2)
                + (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
            ).reshape(qn, nb * rounds)
            fs, fi = jax.lax.top_k(cand_s, k)
            idx = jnp.take_along_axis(cand_i, fi, axis=1)
            return jnp.max(fs), (fs * qs, idx)

        return step

    for q_batch in (16, 64):
        queries = jnp.asarray(
            rng.standard_normal((chain, q_batch, d)).astype(np.float32)
        )

        def run(name, step):
            try:
                dev, _ = bench._chained_slope(
                    jax, step, queries, chain, jnp.zeros((), jnp.float32),
                    consts=consts,
                )
                out[f"q{q_batch}_{name}_ms"] = round(dev, 3)
                out[f"q{q_batch}_{name}_qps"] = round(q_batch / dev * 1000)
                print(f"q{q_batch}_{name}: {dev:.3f} ms "
                      f"({q_batch / dev * 1000:.0f} qps)", flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"q{q_batch}_{name}_error"] = str(e)[:120]
                print(f"q{q_batch}_{name}: ERROR {e}", flush=True)

        run("scores_only", step_scores_only)
        blocks = [b for b in (512, 1024, 2048, 6144, 12288) if n_pad % b == 0]
        for block in blocks[-4:]:
            run(f"blockwise_b{block}", blockwise_step(block))
        if n_pad % 6144 == 0:
            run("argmax3_b6144", blockwise_argmax_step(6144, 3))

    # correctness spot check of the blockwise identity on the real backend
    q = jnp.asarray(rng.standard_normal((4, d)).astype(np.float32))
    s, qs = scores_of(q, p["mq"], p["scales"], p["n_valid"])
    want_s, want_i = jax.lax.top_k(s, k)
    step = blockwise_step(4096)
    _, (got_s, got_i) = step(
        jnp.zeros((), jnp.float32), q, p["mq"], p["scales"], p["rows"], p["n_valid"]
    )
    same = bool(jnp.all(got_i == want_i)) and bool(
        jnp.allclose(got_s, want_s * qs, rtol=1e-5, atol=1e-5)
    )
    out["blockwise_matches_global_topk"] = same
    print("blockwise exactness check:", same, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
