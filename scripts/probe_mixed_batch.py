#!/usr/bin/env python3
"""A/B: is a combined scan pass worth it for MIXED text+image serve batches?

VERDICT r3 item 8. The serve micro-batcher (serve.py:MicroBatcher._process)
runs a mixed window as separate passes: text group -> text_topk_fused
(text tower + int8 scan in one program), image group -> vision-tower embed
+ search_batch scan. A mixed window therefore pays the ~bandwidth-bound
int8 scan TWICE. The candidate: embed both towers, concatenate the query
block, ONE scan.

Decomposition measured here (chain-slope protocol, true device time):
    A (current)  = text_fused(T) + vtower(I) + scan(I)
    B (combined) = ttower(T)     + vtower(I) + scan(T+I)
vtower(I) cancels; the question is whether
    [text_fused(T) - ttower(T)] + scan(I)  >  scan(T+I)
i.e. whether the scan's cost is flat enough in q that merging saves ~one
full matrix read per mixed window.

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mixed_batch.py
Record the verdict in docs/benchmarks.md; implement the combined path in
MicroBatcher only if B wins by enough to matter at realistic load.
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

    from tpuclip.models.configs import get_config
    from tpuclip.models.siglip import (
        get_text_features,
        init_params,
        vision_forward,
    )
    from tpuclip.ops.topk_int8 import text_topk_fused, topk_int8_rerank_fused

    n = int(os.environ.get("PROBE_N", 1_000_000))
    k = 20
    T = int(os.environ.get("PROBE_TEXTS", 2))
    I = int(os.environ.get("PROBE_IMAGES", 2))
    chain = int(os.environ.get("PROBE_CHAIN", 16))
    use_pallas = jax.default_backend() == "tpu"

    # PROBE_MODEL=tpuclip/test-tiny for CPU smoke runs of the protocol;
    # real measurements keep the flagship default.
    cfg = get_config(os.environ.get("PROBE_MODEL", "google/siglip2-so400m-patch14-224"))
    d = cfg.embedding_dim  # matrix dim must match the towers' output
    p = bench._device_prep(jax, n, d)
    dtype = p["dtype"]
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg, dtype=dtype))
    rng = np.random.default_rng(3)
    s = cfg.vision.image_size

    out = {"n": n, "T": T, "I": I, "chain": chain}

    def slope(name, step, inputs, consts):
        dev, amort = bench._chained_slope(
            jax, step, inputs, chain, jnp.zeros((), jnp.float32), consts=consts
        )
        out[name] = round(dev, 3)
        print(f"{name}: {dev:.3f} ms device ({amort:.3f} amortized)", flush=True)
        return dev

    # --- text_fused(T): tower + scan in one program (current text path)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, size=(chain, T, 64)), jnp.int32)
    mask = jnp.ones((chain, T, 64), jnp.int32)

    def step_text_fused(carry, x, params, mq, scales, rows, n_valid):
        ids_x = (x.astype(jnp.float32) + carry * 0.0).astype(jnp.int32)
        s_out, i_out = text_topk_fused(
            params, ids_x, jnp.ones_like(ids_x), mq, scales, rows, cfg, k,
            n_valid=n_valid, compute_dtype=dtype, use_pallas=use_pallas,
        )
        return jnp.max(s_out).astype(jnp.float32), (s_out, i_out)

    a_text_fused = slope(
        "text_fused_T_ms", step_text_fused, ids,
        (params, p["mq"], p["scales"], p["rows"], p["n_valid"]),
    )

    # --- ttower(T): text tower alone
    def step_ttower(carry, x, params):
        ids_x = (x.astype(jnp.float32) + carry * 0.0).astype(jnp.int32)
        emb = get_text_features(
            params, ids_x, cfg, compute_dtype=dtype,
            attention_mask=jnp.ones_like(ids_x),
        )
        return jnp.max(emb).astype(jnp.float32), emb

    b_ttower = slope("ttower_T_ms", step_ttower, ids, (params,))

    # --- vtower(I): vision tower alone (shared by both paths; recorded for
    # completeness)
    pixels = jnp.asarray(rng.integers(0, 256, size=(chain, I, s, s, 3), dtype=np.uint8))

    def step_vtower(carry, x, params):
        px = (x.astype(jnp.float32) + carry * 0.0).astype(jnp.uint8)
        emb = vision_forward(params["vision"], px, cfg.vision, compute_dtype=dtype)
        return jnp.max(emb).astype(jnp.float32), emb

    slope("vtower_I_ms", step_vtower, pixels, (params,))

    # --- scan(q) at q = I and q = T+I
    def scan_step(carry, q, mq, scales, rows, n_valid):
        q = q + carry * 0.0
        s_out, i_out = topk_int8_rerank_fused(
            q, mq, scales, rows, k, n_valid=n_valid, use_pallas=use_pallas,
        )
        return jnp.max(s_out), (s_out, i_out)

    qI = jnp.asarray(rng.standard_normal((chain, I, d)).astype(np.float32))
    qTI = jnp.asarray(rng.standard_normal((chain, T + I, d)).astype(np.float32))
    a_scan_I = slope("scan_I_ms", scan_step, qI, (p["mq"], p["scales"], p["rows"], p["n_valid"]))
    b_scan_TI = slope("scan_TI_ms", scan_step, qTI, (p["mq"], p["scales"], p["rows"], p["n_valid"]))

    a_total = a_text_fused + a_scan_I  # + vtower (cancels)
    b_total = b_ttower + b_scan_TI
    out["A_current_ms"] = round(a_total, 3)
    out["B_combined_ms"] = round(b_total, 3)
    out["saving_ms_per_mixed_window"] = round(a_total - b_total, 3)
    out["verdict"] = "combined wins" if b_total < a_total * 0.9 else (
        "no meaningful win" if b_total > a_total * 0.97 else "marginal"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
