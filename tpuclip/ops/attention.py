"""Fused multi-head attention kernel.

SigLIP attention shapes are small and fixed (256 patch tokens / 64 text
tokens, head_dim 72) — no ring/flash streaming is needed (SURVEY.md §5:
sequence length is structurally capped); the whole (S, S) score block of a
head fits in VMEM. What a fused kernel buys over the einsum path is keeping
QKᵀ, the softmax, and PV in VMEM: the unfused path round-trips the
(B, H, S, S) probability tensor through HBM (batch 64 × 16 heads × 256² fp32
= 1 GB of traffic per tower pass).

Layout: heads are folded into the leading batch axis, (BH, S, dh); the grid
walks BH in chunks so each step runs several heads' batched matmuls
back-to-back on the MXU. head_dim=72 is kept un-padded (block dim == full
array dim is allowed; Mosaic pads lanes internally).

Masked attention (padded text through the reference path) uses the einsum
fallback in tpuclip.models.siglip.mha — fusion is for the unmasked hot path
(the vision tower, where ~90% of attention FLOPs live).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One grid step: full attention for a chunk of heads.

    q/k/v/o refs: (CH, S, dh).
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    # (CH, S, S) logits, fp32.
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(q.dtype)
    o_ref[:] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _head_chunk(bh: int, limit: int = 16) -> int:
    """Largest divisor of bh that is <= limit."""
    for c in range(min(limit, bh), 0, -1):
        if bh % c == 0:
            return c
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Unmasked softmax attention. q/k/v: (B, S, H, dh) → (B, S, H, dh).

    Numerics: logits and softmax in fp32, PV accumulation fp32, output in the
    input dtype — same as the einsum path in tpuclip.models.siglip.mha.
    """
    b, s, h, dh = q.shape
    scale = 1.0 / math.sqrt(dh)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, dh)

    qf, kf, vf = fold(q), fold(k), fold(v)
    bh = b * h
    ch = _head_chunk(bh)
    grid = (bh // ch,)

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ch, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ch, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * dh,
            bytes_accessed=4 * bh * s * dh * q.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
    )(qf, kf, vf)

    return out.reshape(b, h, s, dh).transpose(0, 2, 1, 3)
