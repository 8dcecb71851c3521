"""Fused attention kernel vs einsum oracle (SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax

from conftest import cpu_only
import jax.numpy as jnp

from tpuclip.ops.attention import fused_attention


def _oracle(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bqhd,bkhd->bhqk", q, k).astype(np.float64) * scale
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, v)


@cpu_only
@pytest.mark.parametrize("b,s,h,dh", [(2, 16, 4, 72), (1, 64, 4, 16), (3, 32, 2, 128)])
def test_fused_attention_matches_oracle(b, s, h, dh):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, s, h, dh)).astype(np.float32)
    k = rng.standard_normal((b, s, h, dh)).astype(np.float32)
    v = rng.standard_normal((b, s, h, dh)).astype(np.float32)
    out = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_model_forward_with_pallas_attention_flag():
    """vision_forward(use_pallas_attention=True) must equal the einsum path
    (interpret mode on CPU)."""
    from unittest import mock

    from tpuclip.models import get_config, init_params
    from tpuclip.models.siglip import vision_forward
    from tpuclip.ops import attention as attn_mod

    cfg = get_config("tpuclip/test-tiny")
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8)
    base = np.asarray(vision_forward(params["vision"], jnp.asarray(pix), cfg.vision))

    orig = attn_mod.fused_attention
    fused_interp = lambda q, k, v: orig(q, k, v, interpret=True)  # noqa: E731
    with mock.patch.object(attn_mod, "fused_attention", fused_interp):
        out = np.asarray(
            vision_forward(
                params["vision"], jnp.asarray(pix), cfg.vision, use_pallas_attention=True
            )
        )
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-5)
