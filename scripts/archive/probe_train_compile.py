"""Bisect the train-step remote-compile crash (2026-08-18).

The SO400M sigmoid-contrastive fwd+bwd+AdamW program reproducibly kills
the axon remote-compile helper (HTTP 500, subprocess exit 1) while every
inference program compiles fine. This bisects which ingredient breaks it,
using AOT ``.lower().compile()`` so no execution is involved:

  fwd       loss forward only (vision+text towers + sigmoid loss)
  grad      jax.grad of the loss
  grad8     same at batch=8 (bench shape) if batch=2 passed
  step      full make_train_step (grad + AdamW update)

Run stages individually to isolate crashes across processes:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_train_compile.py fwd
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuclip.models.configs import get_config
from tpuclip.models.siglip import init_params
from tpuclip.parallel.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
    sigmoid_contrastive_loss,
)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(f"backend: {jax.default_backend()}  stage={stage} batch={batch}", flush=True)
    cfg = get_config("google/siglip2-so400m-patch14-224")
    params = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
    side = cfg.vision.image_size
    img_s = jax.ShapeDtypeStruct((batch, side, side, 3), jnp.uint8)
    ids_s = jax.ShapeDtypeStruct((batch, cfg.text.max_length), jnp.int32)

    t0 = time.perf_counter()
    if stage == "fwd":
        def fwd(p, im, ii):
            return sigmoid_contrastive_loss(p, im, ii, cfg)

        lowered = jax.jit(fwd).lower(params, img_s, ids_s)
    elif stage == "grad":
        def gradfn(p, im, ii):
            return jax.grad(
                lambda pp: sigmoid_contrastive_loss(pp, im, ii, cfg)
            )(p)

        lowered = jax.jit(gradfn).lower(params, img_s, ids_s)
    elif stage == "step":
        opt = make_optimizer()
        state_s = jax.eval_shape(lambda p: init_train_state(p, opt), params)
        step = make_train_step(cfg, opt)
        lowered = step.lower(state_s, img_s, ids_s)
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"lowered in {time.perf_counter() - t0:.1f}s", flush=True)
    hlo_len = len(lowered.as_text())
    print(f"HLO text: {hlo_len/1e6:.1f} MB", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"COMPILED OK in {time.perf_counter() - t0:.1f}s", flush=True)
    mem = compiled.memory_analysis()
    if mem is not None:
        print(
            f"temp {getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f} GB, "
            f"args {getattr(mem, 'argument_size_in_bytes', 0)/1e9:.2f} GB",
            flush=True,
        )


if __name__ == "__main__":
    main()
