"""Fused patch-embedding kernel: uint8 dequant + normalize + GEMM.

The vision tower's first op turns uint8 pixels into patch embeddings. The
XLA path (tpuclip.models.siglip.patch_embed) is reshape → convert → scale →
matmul, which XLA fuses into the GEMM's operand load; this Pallas version
does the same explicitly — uint8 patch rows stream through VMEM, are
dequantized/normalized in registers (x/127.5 - 1), and hit the MXU — reading
the image bytes exactly once at 1 byte/pixel.

Input is the pre-flattened patch view (B*N, P*P*C) uint8 (the reshape is a
free layout change in XLA); output (B*N, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_embed_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32) * (1.0 / 127.5) - 1.0
    w = w_ref[:]
    acc = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "tile_rows", "interpret"))
def patch_embed_fused(
    patches_u8: jnp.ndarray,  # (R, P*P*C) uint8, R = B * num_patches
    kernel: jnp.ndarray,  # (P*P*C, D)
    bias: jnp.ndarray,  # (D,)
    out_dtype=jnp.bfloat16,
    tile_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    r, pin = patches_u8.shape
    d = kernel.shape[1]
    if r == 0:  # avoid tile=0 → division by zero in the grid computation
        return jnp.zeros((0, d), out_dtype)
    tile = min(tile_rows, r)
    rem = (-r) % tile
    if rem:
        patches_u8 = jnp.pad(patches_u8, ((0, rem), (0, 0)))
    rp = patches_u8.shape[0]

    out = pl.pallas_call(
        _patch_embed_kernel,
        grid=(rp // tile,),
        in_specs=[
            pl.BlockSpec((tile, pin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pin, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * pin * d,
            bytes_accessed=rp * pin + pin * d * kernel.dtype.itemsize + rp * d * 2,
            transcendentals=0,
        ),
    )(patches_u8, kernel, bias)
    return out[:r]


def patches_from_images_u8(pixel_values_u8: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """uint8 NHWC (B, H, W, C) → (B * N, P*P*C) patch rows, (ph, pw, c) order
    (matches tpuclip.models.siglip.patch_embed)."""
    b, h, w, c = pixel_values_u8.shape
    ps = patch_size
    hp, wp = h // ps, w // ps
    x = pixel_values_u8.reshape(b, hp, ps, wp, ps, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * hp * wp, ps * ps * c)
