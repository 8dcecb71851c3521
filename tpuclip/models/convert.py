"""Convert HuggingFace SigLIP checkpoints to tpuclip parameter pytrees.

The reference loads ``SiglipModel.from_pretrained`` (image_database.py:203,
:224). We read the same on-disk artifacts directly — config.json plus
safetensors (own minimal reader, no deps) or a pytorch_model.bin (via torch if
present) — and remap to the stacked-layer pytree used by
tpuclip.models.siglip.

Key layout transforms (torch → jax):
- ``nn.Linear.weight`` is (out, in) → transposed to (in, out).
- Patch conv weight (D, C, P, P) → (P, P, C, ·) flattened to (P*P*C, D),
  matching the (ph, pw, c) patch-pixel order used by
  siglip.patch_embed's reshape.
- ``nn.MultiheadAttention`` (MAP head) packs q/k/v as in_proj_weight (3D, D);
  split into three (D, D) then transpose.
- Per-layer tensors are stacked along a new leading layer axis for lax.scan.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict, Mapping

import numpy as np

from tpuclip.models.configs import SiglipConfig

__all__ = ["read_safetensors", "params_from_state_dict", "params_from_torch_model"]


# =============================================================================
# Minimal safetensors reader (format: u64 header_len | JSON header | raw data)
# =============================================================================

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _st_dtype(name: str):
    if name == "BF16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    try:
        return np.dtype(_ST_DTYPES[name])
    except KeyError as e:
        raise ValueError(f"Unsupported safetensors dtype: {name}") from e


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into a dict of numpy arrays."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype = _st_dtype(meta["dtype"])
        shape = meta["shape"]
        start, end = meta["data_offsets"]
        arr = np.frombuffer(data[start:end], dtype=dtype)
        out[name] = arr.reshape(shape)
    return out


def read_checkpoint_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all weights from an HF-layout model directory (single or sharded
    safetensors; falls back to pytorch_model.bin via torch)."""
    d = Path(model_dir)
    index = d / "model.safetensors.index.json"
    if index.exists():
        with open(index, "r", encoding="utf-8") as f:
            weight_map: Mapping[str, str] = json.load(f)["weight_map"]
        tensors: Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            tensors.update(read_safetensors(str(d / shard)))
        return tensors
    single = d / "model.safetensors"
    if single.exists():
        return read_safetensors(str(single))
    torch_bin = d / "pytorch_model.bin"
    if torch_bin.exists():
        import torch

        sd = torch.load(str(torch_bin), map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"No model weights found in {model_dir} "
        "(looked for model.safetensors[.index.json], pytorch_model.bin)"
    )


# =============================================================================
# State-dict → pytree
# =============================================================================


def _f32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32) if x.dtype != np.float32 else x


def _t(x: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) → (in, out)."""
    return _f32(x).T.copy()


def _encoder_stack(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int) -> Dict[str, np.ndarray]:
    def stack(fmt: str, transform) -> np.ndarray:
        return np.stack([transform(np.asarray(sd[fmt.format(i=i)])) for i in range(num_layers)])

    p = prefix
    return {
        "ln1_scale": stack(p + ".layers.{i}.layer_norm1.weight", _f32),
        "ln1_bias": stack(p + ".layers.{i}.layer_norm1.bias", _f32),
        "q_kernel": stack(p + ".layers.{i}.self_attn.q_proj.weight", _t),
        "q_bias": stack(p + ".layers.{i}.self_attn.q_proj.bias", _f32),
        "k_kernel": stack(p + ".layers.{i}.self_attn.k_proj.weight", _t),
        "k_bias": stack(p + ".layers.{i}.self_attn.k_proj.bias", _f32),
        "v_kernel": stack(p + ".layers.{i}.self_attn.v_proj.weight", _t),
        "v_bias": stack(p + ".layers.{i}.self_attn.v_proj.bias", _f32),
        "o_kernel": stack(p + ".layers.{i}.self_attn.out_proj.weight", _t),
        "o_bias": stack(p + ".layers.{i}.self_attn.out_proj.bias", _f32),
        "ln2_scale": stack(p + ".layers.{i}.layer_norm2.weight", _f32),
        "ln2_bias": stack(p + ".layers.{i}.layer_norm2.bias", _f32),
        "fc1_kernel": stack(p + ".layers.{i}.mlp.fc1.weight", _t),
        "fc1_bias": stack(p + ".layers.{i}.mlp.fc1.bias", _f32),
        "fc2_kernel": stack(p + ".layers.{i}.mlp.fc2.weight", _t),
        "fc2_bias": stack(p + ".layers.{i}.mlp.fc2.bias", _f32),
    }


def params_from_state_dict(sd: Mapping[str, np.ndarray], cfg: SiglipConfig) -> Dict[str, Any]:
    """Map an HF SiglipModel state dict (numpy values) to a tpuclip pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    v, t = cfg.vision, cfg.text

    # ---- vision embeddings -------------------------------------------------
    patch_w = _f32(np.asarray(sd["vision_model.embeddings.patch_embedding.weight"]))
    if v.naflex:
        # NaFlex (Siglip2VisionEmbeddings): patch embed is nn.Linear over
        # already-patchified pixels — (D, P*P*C) → (P*P*C, D).
        patch_kernel = patch_w.T.copy()
    else:
        # Fixed-res conv: (D, C, P, P) → (P, P, C, D) → (P*P*C, D)
        patch_kernel = patch_w.transpose(2, 3, 1, 0).reshape(
            v.patch_size * v.patch_size * v.num_channels, v.hidden_size
        ).copy()

    # ---- MAP head (torch nn.MultiheadAttention packing) --------------------
    in_proj_w = _f32(np.asarray(sd["vision_model.head.attention.in_proj_weight"]))
    in_proj_b = _f32(np.asarray(sd["vision_model.head.attention.in_proj_bias"]))
    d = v.hidden_size
    head = {
        "probe": _f32(np.asarray(sd["vision_model.head.probe"])).reshape(1, d),
        "q_kernel": in_proj_w[:d].T.copy(),
        "q_bias": in_proj_b[:d].copy(),
        "k_kernel": in_proj_w[d : 2 * d].T.copy(),
        "k_bias": in_proj_b[d : 2 * d].copy(),
        "v_kernel": in_proj_w[2 * d :].T.copy(),
        "v_bias": in_proj_b[2 * d :].copy(),
        "o_kernel": _t(np.asarray(sd["vision_model.head.attention.out_proj.weight"])),
        "o_bias": _f32(np.asarray(sd["vision_model.head.attention.out_proj.bias"])),
        "ln_scale": _f32(np.asarray(sd["vision_model.head.layernorm.weight"])),
        "ln_bias": _f32(np.asarray(sd["vision_model.head.layernorm.bias"])),
        "fc1_kernel": _t(np.asarray(sd["vision_model.head.mlp.fc1.weight"])),
        "fc1_bias": _f32(np.asarray(sd["vision_model.head.mlp.fc1.bias"])),
        "fc2_kernel": _t(np.asarray(sd["vision_model.head.mlp.fc2.weight"])),
        "fc2_bias": _f32(np.asarray(sd["vision_model.head.mlp.fc2.bias"])),
    }

    vision = {
        "embeddings": {
            "patch_kernel": patch_kernel,
            "patch_bias": _f32(np.asarray(sd["vision_model.embeddings.patch_embedding.bias"])),
            "pos_embed": _f32(np.asarray(sd["vision_model.embeddings.position_embedding.weight"])),
        },
        "encoder": _encoder_stack(sd, "vision_model.encoder", v.num_layers),
        "post_ln": {
            "scale": _f32(np.asarray(sd["vision_model.post_layernorm.weight"])),
            "bias": _f32(np.asarray(sd["vision_model.post_layernorm.bias"])),
        },
        "head": head,
    }

    text = {
        "token_embedding": _f32(np.asarray(sd["text_model.embeddings.token_embedding.weight"])),
        "pos_embed": _f32(np.asarray(sd["text_model.embeddings.position_embedding.weight"])),
        "encoder": _encoder_stack(sd, "text_model.encoder", t.num_layers),
        "final_ln": {
            "scale": _f32(np.asarray(sd["text_model.final_layer_norm.weight"])),
            "bias": _f32(np.asarray(sd["text_model.final_layer_norm.bias"])),
        },
        "head": {
            "kernel": _t(np.asarray(sd["text_model.head.weight"])),
            "bias": _f32(np.asarray(sd["text_model.head.bias"])),
        },
    }

    params: Dict[str, Any] = {"vision": vision, "text": text}
    if "logit_scale" in sd:
        params["logit_scale"] = _f32(np.asarray(sd["logit_scale"])).reshape(())
    if "logit_bias" in sd:
        params["logit_bias"] = _f32(np.asarray(sd["logit_bias"])).reshape(())
    return params


def params_from_torch_model(model, cfg: SiglipConfig) -> Dict[str, Any]:
    """Convert a live torch SiglipModel (e.g. random-init in tests)."""
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    return params_from_state_dict(sd, cfg)
