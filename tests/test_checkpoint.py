"""Checkpoint round-trips: tpuclip-native model format + orbax train state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuclip.models import get_config, init_params
from tpuclip.models.checkpoint import (
    is_tpuclip_checkpoint,
    load_checkpoint,
    save_checkpoint,
    write_safetensors,
)
from tpuclip.models.convert import read_safetensors
from tpuclip.models.siglip import get_image_features


def test_safetensors_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a/b": rng.standard_normal((3, 5)).astype(np.float32),
        "a/c": rng.integers(0, 100, (7,), dtype=np.int32),
        "d": np.asarray(jnp.ones((4, 4), jnp.bfloat16)),
        "u8": rng.integers(0, 256, (2, 2), dtype=np.uint8),
    }
    path = tmp_path / "t.safetensors"
    write_safetensors(str(path), tensors)
    back = read_safetensors(str(path))
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(
            np.asarray(back[k], np.float64 if k != "u8" else np.uint8),
            np.asarray(tensors[k], np.float64 if k != "u8" else np.uint8),
        )


def test_model_checkpoint_roundtrip(tmp_path):
    cfg = get_config("tpuclip/test-tiny")
    params = init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path / "ckpt"
    save_checkpoint(str(d), params, cfg)
    assert is_tpuclip_checkpoint(str(d))

    cfg2, params2 = load_checkpoint(str(d))
    assert cfg2 == cfg
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8)
    a = np.asarray(get_image_features(params, jnp.asarray(pix), cfg))
    b = np.asarray(get_image_features(params2, jnp.asarray(pix), cfg2))
    np.testing.assert_array_equal(a, b)


def test_loader_prefers_tpuclip_format(tmp_path):
    from tpuclip.models.loader import load_model

    cfg = get_config("tpuclip/test-tiny")
    params = init_params(jax.random.PRNGKey(3), cfg)
    cache = tmp_path / "models"
    save_checkpoint(str(cache / "tpuclip--test-tiny"), params, cfg)
    cfg2, params2 = load_model("tpuclip/test-tiny", str(cache))
    assert cfg2.name == cfg.name
    np.testing.assert_array_equal(
        np.asarray(params2["text"]["token_embedding"]),
        np.asarray(params["text"]["token_embedding"]),
    )


def test_train_state_checkpoint_roundtrip(tmp_path):
    from tpuclip.parallel.checkpoint import restore_train_state, save_train_state
    from tpuclip.parallel.training import init_train_state, make_optimizer, make_train_step

    cfg = get_config("tpuclip/test-tiny")
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(learning_rate=1e-3)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.integers(0, 256, size=(4, 56, 56, 3), dtype=np.uint8))
    ids = jnp.asarray(rng.integers(0, 512, size=(4, 64)))
    state, _ = step(state, images, ids)

    save_train_state(str(tmp_path / "train"), state)
    # restore with a template so optax's NamedTuple opt_state structure (and
    # any shardings) are reconstructed exactly
    template = init_train_state(params, opt)
    restored = restore_train_state(str(tmp_path / "train"), template=template)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # resumed training continues without error
    state2, loss = step(
        restored if isinstance(restored, type(state)) else state, images, ids
    )
    assert np.isfinite(float(loss))
