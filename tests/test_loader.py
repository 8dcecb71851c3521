"""Checkpoint loader paths: sharded safetensors, pytorch_model.bin, hub cache
layout, and the random-init gate."""

import json

import numpy as np
import pytest

from tpuclip.models.checkpoint import write_safetensors
from tpuclip.models.convert import read_checkpoint_dir, read_safetensors


def test_sharded_safetensors(tmp_path):
    rng = np.random.default_rng(0)
    t1 = {"a": rng.standard_normal((4, 4)).astype(np.float32)}
    t2 = {"b": rng.standard_normal((2, 8)).astype(np.float32),
          "c": np.arange(5, dtype=np.int64)}
    write_safetensors(str(tmp_path / "model-00001-of-00002.safetensors"), t1)
    write_safetensors(str(tmp_path / "model-00002-of-00002.safetensors"), t2)
    index = {
        "weight_map": {
            "a": "model-00001-of-00002.safetensors",
            "b": "model-00002-of-00002.safetensors",
            "c": "model-00002-of-00002.safetensors",
        }
    }
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(index))
    out = read_checkpoint_dir(str(tmp_path))
    assert set(out) == {"a", "b", "c"}
    np.testing.assert_array_equal(out["a"], t1["a"])
    np.testing.assert_array_equal(out["c"], t2["c"])


def test_pytorch_bin_fallback(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"x.weight": torch.randn(3, 3), "y.bias": torch.randn(4)}
    torch.save(sd, tmp_path / "pytorch_model.bin")
    out = read_checkpoint_dir(str(tmp_path))
    np.testing.assert_allclose(out["x.weight"], sd["x.weight"].numpy(), rtol=1e-6)


def test_missing_weights_error(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_checkpoint_dir(str(tmp_path))


def test_bf16_safetensors_roundtrip(tmp_path):
    import jax.numpy as jnp

    arr = np.asarray(jnp.linspace(-3, 3, 64, dtype=jnp.bfloat16)).reshape(8, 8)
    write_safetensors(str(tmp_path / "model.safetensors"), {"w": arr})
    back = read_safetensors(str(tmp_path / "model.safetensors"))
    assert str(back["w"].dtype) == "bfloat16"
    np.testing.assert_array_equal(
        back["w"].astype(np.float32), arr.astype(np.float32)
    )


def test_hub_cache_layout(tmp_path):
    from tpuclip.models.loader import find_local_checkpoint

    snap = tmp_path / "models--google--siglip2-base-patch16-224" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "config.json").write_text("{}")
    found = find_local_checkpoint("google/siglip2-base-patch16-224", str(tmp_path))
    assert found == snap


def test_random_init_requires_opt_in(tmp_path, monkeypatch):
    from tpuclip.models.loader import load_model

    monkeypatch.delenv("TPUCLIP_INIT", raising=False)
    with pytest.raises(FileNotFoundError):
        load_model("tpuclip/test-tiny", str(tmp_path))
    cfg, params = load_model("tpuclip/test-tiny", str(tmp_path), allow_random=True)
    assert cfg.name == "tpuclip/test-tiny"


def test_giant_opt_preset_roundtrips_hf_config():
    """The giant-opt preset (VERDICT r4 item 7) must agree with what
    config_from_hf_dict would build from an HF-style config.json carrying
    the published g-opt tower shape (width 1536 / depth 40 / MLP 6144 /
    16 heads, So400m-sized text tower projecting to the vision width).
    A real checkpoint's own config.json always overrides the preset
    (loader.py:64-67); this guards the offline/random-init shape."""
    from tpuclip.models.configs import config_from_hf_dict, get_config

    hf_cfg = {
        "model_type": "siglip",  # fixed-resolution variant
        "vision_config": {
            "hidden_size": 1536,
            "intermediate_size": 6144,
            "num_hidden_layers": 40,
            "num_attention_heads": 16,
            "image_size": 384,
            "patch_size": 16,
        },
        "text_config": {
            "vocab_size": 256000,
            "hidden_size": 1152,
            "intermediate_size": 4304,
            "num_hidden_layers": 27,
            "num_attention_heads": 16,
            "projection_size": 1536,
        },
    }
    name = "google/siglip2-giant-opt-patch16-384"
    preset = get_config(name)
    derived = config_from_hf_dict(name, hf_cfg)
    assert preset.vision == derived.vision
    assert preset.text.vocab_size == derived.text.vocab_size
    assert preset.text.hidden_size == derived.text.hidden_size
    assert preset.text.projection_size == derived.text.projection_size
    assert preset.embedding_dim == 1536


def test_giant_opt_naflex_preset_shape():
    from tpuclip.models.configs import get_config

    cfg = get_config("google/siglip2-giant-opt-patch16-naflex")
    assert cfg.vision.naflex and cfg.vision.max_num_patches == 256
    assert cfg.vision.hidden_size == 1536 and cfg.vision.num_layers == 40
    assert cfg.embedding_dim == 1536
