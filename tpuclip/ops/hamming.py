"""Binary-embedding scoring on device.

The reference's binary fallback fetches every BLOB into Python and computes
``np.dot(query_bits, cand_bits)`` per row (image_database.py:1616-1625). The
binary "score" is the count of positions where both sign bits are 1,
normalized by the dimension (NOT true Hamming similarity — kept for parity).

TPU-native form: sign bits stored as int8 {0,1}; the score for all N rows is
one int8 matmul on the MXU with int32 accumulation — exact integer math,
~2 bytes/elem read. Top-k reuses the same machinery as the float path.

Also provides packed-uint8 Hamming distance (XOR+popcount) used by the
duplicate filter when comparing pairs on host.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def binary_topk(
    query_bits: jnp.ndarray,
    matrix_bits_t: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unpacked path: query_bits (Q, D) int8 {0,1}; matrix_bits_t (D, N) int8
    {0,1} (feature-major). One int8 MXU matmul, exact int32 accumulation.

    Returns (matches (Q,k) int32, idx (Q,k) int32), descending, ties to the
    lowest index. matches/D is the reference's similarity score
    (image_database.py:1621-1624). Prefer :func:`binary_topk_packed` for
    device residency (16x less HBM).
    """
    n = matrix_bits_t.shape[1]
    k_eff = min(k, n) if n > 0 else 0
    if k_eff == 0:
        q = query_bits.shape[0]
        return jnp.zeros((q, 0), jnp.int32), jnp.zeros((q, 0), jnp.int32)
    scores = jnp.dot(
        query_bits.astype(jnp.int8), matrix_bits_t.astype(jnp.int8),
        preferred_element_type=jnp.int32,
    )
    if mask is not None:
        scores = jnp.where(mask[None, :] < 0, jnp.iinfo(jnp.int32).min, scores)
    top_scores, top_idx = jax.lax.top_k(scores, k_eff)
    order = jnp.lexsort((top_idx, -top_scores), axis=-1)
    return (
        jnp.take_along_axis(top_scores, order, axis=1),
        jnp.take_along_axis(top_idx, order, axis=1).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def binary_topk_packed(
    query_words: jnp.ndarray,
    matrix_words: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed path: query_words (Q, W) uint32/int32 packed bits;
    matrix_words (N, W) — 1 bit/dimension in HBM (144 B/row at 1152-d,
    vs 1152 B unpacked). matches = popcount(q & row) per row, exactly the
    reference's binary dot (image_database.py:1621); VPU ``bitwise_count``
    does the counting. Same ordering semantics as the other kernels.
    """
    n = matrix_words.shape[0]
    k_eff = min(k, n) if n > 0 else 0
    if k_eff == 0:
        q = query_words.shape[0]
        return jnp.zeros((q, 0), jnp.int32), jnp.zeros((q, 0), jnp.int32)
    anded = jnp.bitwise_and(query_words[:, None, :], matrix_words[None, :, :])
    scores = jnp.sum(jnp.bitwise_count(anded).astype(jnp.int32), axis=-1)  # (Q, N)
    if mask is not None:
        scores = jnp.where(mask[None, :] < 0, jnp.iinfo(jnp.int32).min, scores)
    top_scores, top_idx = jax.lax.top_k(scores, k_eff)
    order = jnp.lexsort((top_idx, -top_scores), axis=-1)
    return (
        jnp.take_along_axis(top_scores, order, axis=1),
        jnp.take_along_axis(top_idx, order, axis=1).astype(jnp.int32),
    )


def pack_bits_to_words(bits01: np.ndarray) -> np.ndarray:
    """(N, D) uint8 {0,1} → (N, ceil(D/32)) uint32 words (np.packbits order,
    zero-padded). Queries and matrices must both come through here so the
    bit order cancels in AND+popcount."""
    packed = np.packbits(np.atleast_2d(bits01).astype(np.uint8), axis=-1)
    pad = (-packed.shape[-1]) % 4
    if pad:
        packed = np.pad(packed, ((0, 0), (0, pad)))
    return packed.view(np.uint32)


_POPCOUNT_TABLE = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def hamming_distance_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise-free Hamming distance between packed uint8 bit rows.

    a (..., W), b (..., W) → (...,) int32 distances. Host-side numpy (the
    duplicate filter compares only the k result rows); a native C++ popcount
    path exists in tpuclip.native for large batches.
    """
    x = np.bitwise_xor(a, b)
    return _POPCOUNT_TABLE[x].sum(axis=-1).astype(np.int32)


def hamming_matrix_packed(rows: np.ndarray) -> np.ndarray:
    """All-pairs Hamming distances for packed uint8 rows (n, W) → (n, n)."""
    n = rows.shape[0]
    x = np.bitwise_xor(rows[:, None, :], rows[None, :, :])
    return _POPCOUNT_TABLE[x].sum(axis=-1).astype(np.int32)


def pack_bits(bits01: np.ndarray) -> np.ndarray:
    """(N, D) uint8 {0,1} → (N, D//8) packed uint8 (np.packbits bit order)."""
    return np.packbits(bits01.astype(np.uint8), axis=-1)


def sign_bits(embedding: np.ndarray) -> np.ndarray:
    """Reference sign quantization: (e >= 0) (image_database.py:1189)."""
    return (np.asarray(embedding) >= 0).astype(np.uint8)
