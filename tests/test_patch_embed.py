"""Fused patch-embed kernel vs the XLA reference path."""

import numpy as np

import jax
import jax.numpy as jnp

from tpuclip.models import get_config, init_params
from tpuclip.models.siglip import normalize_pixels, patch_embed
from tpuclip.ops.patch_embed import patch_embed_fused, patches_from_images_u8


def test_patch_embed_fused_matches_reference():
    cfg = get_config("tpuclip/test-tiny").vision
    params = init_params(jax.random.PRNGKey(0), get_config("tpuclip/test-tiny"))
    emb = params["vision"]["embeddings"]
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, size=(3, 56, 56, 3), dtype=np.uint8)

    ref = patch_embed(
        normalize_pixels(jnp.asarray(pix), jnp.float32), emb, cfg
    )  # (B, N, D)

    rows = patches_from_images_u8(jnp.asarray(pix), cfg.patch_size)
    out = patch_embed_fused(
        rows, emb["patch_kernel"], emb["patch_bias"], out_dtype=jnp.float32,
        tile_rows=8, interpret=True,
    )
    out = np.asarray(out).reshape(3, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_patch_rows_layout_matches_model_reshape():
    """patches_from_images_u8 must produce the exact (ph, pw, c) pixel order
    the conv-as-GEMM kernel expects."""
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(2, 28, 28, 3), dtype=np.uint8)
    rows = np.asarray(patches_from_images_u8(jnp.asarray(pix), 14))
    # manual patch (0, grid(1,0)) == rows[2] for image 0 (grid row-major, 2x2)
    manual = pix[0, 14:28, 0:14, :].reshape(-1)
    np.testing.assert_array_equal(rows[2], manual)
