"""Image preprocessing for the SigLIP towers.

HF's SiglipImageProcessor resizes to (size, size) with PIL bicubic, rescales
by 1/255 and normalizes with mean=std=0.5 — all on host, in serial Python,
per image (the reference's known bottleneck, SURVEY.md §3.1). TPU-native
split:

- Host does ONLY the uint8 bicubic resize (PIL's C resampler, bit-identical
  to HF since HF also resizes the uint8 image before any float math).
- The uint8 batch ships to the device (4x fewer transfer bytes than f32) and
  rescale+normalize fuse into the tower's first GEMM
  (tpuclip.models.siglip.normalize_pixels).

An optional native path (tpuclip.native) accelerates resize for very hot
scans; PIL remains the correctness reference.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from PIL import Image

IMAGE_MEAN = 0.5
IMAGE_STD = 0.5


def resize_to_uint8(image: Image.Image, image_size: int) -> np.ndarray:
    """PIL bicubic resize to (S, S); returns uint8 (S, S, 3).

    Matches SiglipImageProcessor: resample=BICUBIC on the uint8 image.
    """
    if image.mode != "RGB":
        image = image.convert("RGB")
    if image.size != (image_size, image_size):
        image = image.resize((image_size, image_size), Image.Resampling.BICUBIC)
    arr = np.asarray(image, dtype=np.uint8)
    if arr.shape != (image_size, image_size, 3):  # paranoid: palette edge cases
        arr = np.ascontiguousarray(arr[..., :3])
    return arr


def preprocess_batch(
    images: List[Optional[Image.Image]], image_size: int
) -> np.ndarray:
    """Stack decoded images into a uint8 (B, S, S, 3) batch; None slots are
    zero-filled (callers track validity separately)."""
    batch = np.zeros((len(images), image_size, image_size, 3), dtype=np.uint8)
    for i, img in enumerate(images):
        if img is not None:
            batch[i] = resize_to_uint8(img, image_size)
    return batch


def normalize_reference(batch_uint8: np.ndarray) -> np.ndarray:
    """Host-side float normalization — the exact HF arithmetic, used in tests
    to validate the fused on-device path."""
    x = batch_uint8.astype(np.float32) / 255.0
    return (x - IMAGE_MEAN) / IMAGE_STD
