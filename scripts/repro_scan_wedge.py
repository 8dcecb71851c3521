#!/usr/bin/env python3
"""Minimal repro + root cause for the "lax.scan wedge" (VERDICT r2 item 5).

Round-2 observation: wrapping ``text_topk_fused`` (text tower + int8 scan +
rescore, ONE program) in ``lax.scan``/``fori_loop`` reliably "wedged the dev
tunnel's remote-compile helper", while the same body compiled alone in ~10 s.

Root-cause hypothesis (confirmed by this ladder): **the scan was innocent —
closure-captured device arrays were the trigger.** A scanned step function
written as a closure captures the model params (~1.2 GB) and the resident
index matrices (int8 + scales + rows, ~3.5 GB at 1M rows) as *lowered
constants*; jax serializes lowered constants into the program payload, and
the axon remote-compile helper then ships multi-GB of constants over the
tunnel (tens of MB/s → tens of minutes, indistinguishable from a hang).
The unscanned r2 body compiled fine because it passed the same arrays as
jit *arguments*. jax even warns: "A large amount of constants were captured
during lowering" — the round-3 bench rewrite hit the same warning and fixed
it by threading every resident array through as a real jit argument
(bench.py `_chained_p50` consts).

The ladder isolates the two axes — (consts as ARGS | consts CLOSED over) x
(plain | lax.scan) — each stage lower/compile/run separately with timings
and a heartbeat, fast cases first:

  A. args,    no scan   — expect fast
  B. args,    lax.scan  — expect fast (bench r3 headline protocol)
  C. closure, no scan   — expect SLOW (constant payload, no scan involved)
  D. closure, lax.scan  — the r2 "wedge"

Run bounded:  timeout 1800 python -u scripts/repro_scan_wedge.py
Findings recorded in docs/benchmarks.md ("The lax.scan wedge, root-caused").
"""

import os
import sys
import threading
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Surface the smoking-gun warning prominently.
warnings.filterwarnings("default")

STAGE_BUDGET_S = float(os.environ.get("WEDGE_STAGE_BUDGET_S", 420))


def main():
    import jax
    import jax.numpy as jnp

    try:
        from tpuclip.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:  # noqa: BLE001
        pass

    from tpuclip.models.configs import get_config
    from tpuclip.ops.topk_int8 import INT8_TILE_N, text_topk_fused
    from tpuclip.models.siglip import init_params

    t0 = time.perf_counter()
    state = {"stage": "init"}

    def say(msg):
        print(f"[+{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)

    def _beat():
        while True:
            time.sleep(60)
            say(f"[heartbeat] in: {state['stage']}")

    threading.Thread(target=_beat, daemon=True).start()

    backend = jax.default_backend()
    say(f"backend: {backend}")
    n, d, k, chain = 98_304, 1152, 20, 4  # n = 16 int8 tiles, small HBM
    assert n % INT8_TILE_N == 0
    cfg = get_config("google/siglip2-so400m-patch14-224")
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    use_pallas = backend == "tpu"

    say("building device data + SO400M params")
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg, dtype=dtype))

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
    say("device data ready")

    def body(params, ids, mq, scales, rows):
        return text_topk_fused(
            params, ids, mask, mq, scales, rows, cfg, k,
            n_valid=n_valid, compute_dtype=dtype, use_pallas=use_pallas,
        )

    def staged(name, make_jitted, args):
        """lower → compile → run, each timed; returns False if over budget."""
        state["stage"] = f"{name}:lower"
        say(f"--- {name}: trace/lower start")
        s0 = time.perf_counter()
        fn = make_jitted()
        lowered = fn.lower(*args)
        say(f"{name}: lowered OK ({time.perf_counter() - s0:.1f}s)")
        state["stage"] = f"{name}:compile"
        s1 = time.perf_counter()
        compiled = lowered.compile()
        say(f"{name}: compiled OK ({time.perf_counter() - s1:.1f}s)")
        state["stage"] = f"{name}:run"
        out = compiled(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        say(f"{name}: ran OK (stage total {time.perf_counter() - s0:.1f}s)")
        state["stage"] = f"{name}:done"
        return (time.perf_counter() - s0) < STAGE_BUDGET_S

    # ---- A: consts as ARGUMENTS, no scan --------------------------------
    def make_a():
        return jax.jit(lambda ids, params, mq, scales, rows: body(
            params, ids, mq, scales, rows))

    staged("A_args_plain", make_a, (all_ids[0], params, mq, scales, rows))

    # ---- B: consts as ARGUMENTS, lax.scan (bench r3 protocol) -----------
    def make_b():
        def f(ids, params, mq, scales, rows):
            def step(carry, one):
                s, i = body(params, one + (carry * 0), mq, scales, rows)
                return jnp.max(i), (s, i)

            return jax.lax.scan(step, jnp.zeros((), all_ids.dtype), ids)

        return jax.jit(f)

    staged("B_args_scan", make_b, (all_ids, params, mq, scales, rows))

    # ---- C: consts CLOSED OVER, no scan ---------------------------------
    # params (~1.2 GB) + mq/scales/rows become lowered CONSTANTS here.
    def make_c():
        return jax.jit(lambda ids: body(params, ids, mq, scales, rows))

    ok_c = staged("C_closure_plain", make_c, (all_ids[0],))

    # ---- D: consts CLOSED OVER, lax.scan — the r2 "wedge" ---------------
    def make_d():
        def f(ids):
            def step(carry, one):
                s, i = body(params, one + (carry * 0), mq, scales, rows)
                return jnp.max(i), (s, i)

            return jax.lax.scan(step, jnp.zeros((), all_ids.dtype), ids)

        return jax.jit(f)

    if ok_c:
        staged("D_closure_scan", make_d, (all_ids,))
    else:
        say("D skipped: C already demonstrates the closure-constant cost "
            "without any scan — the scan axis is exonerated")
    say("LADDER COMPLETE")


if __name__ == "__main__":
    main()
