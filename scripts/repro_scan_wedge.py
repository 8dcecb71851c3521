#!/usr/bin/env python3
"""Minimal repro for the lax.scan / remote-compile wedge (VERDICT r2 item 5).

Round-2 observation: wrapping ``text_topk_fused`` (text tower + int8 scan +
rescore, ONE program) in ``lax.scan``/``fori_loop`` reliably wedged the dev
tunnel's remote-compile helper, while the same body compiled alone in ~10 s
and smaller bodies (plain int8 scan) scanned fine. This script isolates the
trigger by lowering/compiling/running a ladder of programs SEPARATELY, with
per-stage wall timings printed as they complete — whatever stage never prints
is the wedge.

Ladder:
  A. text_topk_fused alone (no scan)            — known good
  B. lax.scan over the int8 fused-rerank body   — known good (bench protocol)
  C. lax.scan over the TEXT TOWER alone         — tower-in-scan, no Pallas
  D. lax.scan over text_topk_fused, pallas OFF  — big body in scan, no Pallas
  E. lax.scan over text_topk_fused, pallas ON   — the reported wedge

Run bounded:  timeout 900 python scripts/repro_scan_wedge.py
Findings recorded in docs/benchmarks.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpuclip.models.configs import get_config
    from tpuclip.models.siglip import get_text_features, init_params
    from tpuclip.ops.topk_int8 import (
        INT8_TILE_N,
        text_topk_fused,
        topk_int8_rerank_fused,
    )

    t0 = time.perf_counter()

    def say(msg):
        print(f"[+{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)

    backend = jax.default_backend()
    say(f"backend: {backend}")
    n, d, k, chain = 98_304, 1152, 20, 4  # n = 16 int8 tiles, small HBM
    assert n % INT8_TILE_N == 0
    cfg = get_config("google/siglip2-so400m-patch14-224")
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    use_pallas_default = backend == "tpu"

    say("building device data + SO400M params")
    key = jax.random.PRNGKey(0)
    params = jax.device_put(init_params(key, cfg, dtype=dtype))

    @jax.jit
    def gen(seed):
        m = jax.random.normal(jax.random.PRNGKey(seed), (d, n), dtype=dtype)
        mf = m.astype(jnp.float32)
        scales = jnp.max(jnp.abs(mf), axis=0) / 127.0
        scales = jnp.where(scales == 0, 1.0, scales)
        mq = jnp.clip(jnp.round(mf / scales[None, :]), -127, 127).astype(jnp.int8)
        return mq, scales, m.T

    mq, scales, rows = gen(0)
    jax.block_until_ready(rows)
    n_valid = jnp.asarray(n, jnp.int32)
    rng = np.random.default_rng(0)
    all_ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, size=(chain, 1, 64), dtype=np.int32)
    )
    mask = jnp.ones((1, 64), jnp.int32)
    qf = jnp.asarray(rng.standard_normal((chain, 1, d), dtype=np.float32))
    say("device data ready")

    def staged(name, make_jitted, args):
        """lower → compile → run, each stage timed and flushed separately."""
        say(f"--- {name}: trace/lower start")
        fn = make_jitted()
        lowered = fn.lower(*args)
        say(f"{name}: lowered OK")
        compiled = lowered.compile()
        say(f"{name}: compiled OK")
        out = compiled(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        say(f"{name}: ran OK")

    # A. fused body alone
    def make_a():
        def f(ids):
            return text_topk_fused(
                params, ids, mask, mq, scales, rows, cfg, k,
                n_valid=n_valid, compute_dtype=dtype,
                use_pallas=use_pallas_default,
            )

        return jax.jit(f)

    staged("A_fused_alone", make_a, (all_ids[0],))

    # B. scan over the int8 fused-rerank body (no tower)
    def make_b():
        def step(carry, q):
            q = q + carry * 0.0
            s, i = topk_int8_rerank_fused(
                q, mq, scales, rows, k, n_valid=n_valid,
                use_pallas=use_pallas_default,
            )
            return jnp.max(s), (s, i)

        def f(qs):
            return jax.lax.scan(step, jnp.zeros((), jnp.float32), qs)

        return jax.jit(f)

    staged("B_scan_int8_body", make_b, (qf,))

    # C. scan over the text tower alone (no Pallas, big body)
    def make_c():
        def step(carry, ids):
            emb = get_text_features(
                params, ids + (carry * 0), cfg,
                compute_dtype=dtype, attention_mask=mask,
            )
            return jnp.max(ids), emb

        def f(ids):
            return jax.lax.scan(step, jnp.zeros((), all_ids.dtype), ids)

        return jax.jit(f)

    staged("C_scan_text_tower", make_c, (all_ids,))

    # D. scan over the FULL fused body, Pallas disabled
    def make_fused_scan(use_pallas):
        def step(carry, ids):
            s, i = text_topk_fused(
                params, ids + (carry * 0), mask, mq, scales, rows, cfg, k,
                n_valid=n_valid, compute_dtype=dtype, use_pallas=use_pallas,
            )
            return jnp.max(ids), (s, i)

        def f(ids):
            return jax.lax.scan(step, jnp.zeros((), all_ids.dtype), ids)

        return jax.jit(f)

    staged("D_scan_fused_no_pallas", lambda: make_fused_scan(False), (all_ids,))

    # E. scan over the FULL fused body, Pallas on — the reported wedge
    if use_pallas_default:
        staged("E_scan_fused_pallas", lambda: make_fused_scan(True), (all_ids,))
    else:
        say("E skipped (no TPU backend)")
    say("ALL STAGES COMPLETED — no wedge at this size")


if __name__ == "__main__":
    main()
