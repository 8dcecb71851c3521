"""Kernel tests: fused matmul+top-k vs a numpy oracle (SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax

from conftest import cpu_only
import jax.numpy as jnp

from tpuclip.ops.topk import cosine_topk, topk_pallas, topk_xla


def _oracle(queries, matrix, k, mask=None):
    scores = queries.astype(np.float64) @ matrix.astype(np.float64).T
    if mask is not None:
        scores = scores + mask[None, :]
    k = min(k, matrix.shape[0])
    out_s = np.zeros((queries.shape[0], k), np.float64)
    out_i = np.zeros((queries.shape[0], k), np.int64)
    for q in range(queries.shape[0]):
        # sort by (-score, idx): descending score, ties to lowest index
        order = np.lexsort((np.arange(scores.shape[1]), -scores[q]))[:k]
        out_s[q] = scores[q][order]
        out_i[q] = order
    return out_s, out_i


@cpu_only
@pytest.mark.parametrize("n,k", [(100, 10), (1000, 20), (5000, 7)])
def test_topk_xla_matches_oracle(n, k):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((3, 64)).astype(np.float32)
    m = rng.standard_normal((n, 64)).astype(np.float32)
    s, i = topk_xla(jnp.asarray(q), jnp.asarray(m.T), k)
    es, ei = _oracle(q, m, k)
    np.testing.assert_array_equal(np.asarray(i), ei)
    np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)


def test_topk_xla_with_mask():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    m = rng.standard_normal((500, 32)).astype(np.float32)
    mask = np.where(rng.random(500) < 0.5, 0.0, -np.inf).astype(np.float32)
    s, i = topk_xla(jnp.asarray(q), jnp.asarray(m.T), 15, mask=jnp.asarray(mask))
    es, ei = _oracle(q, m, 15, mask)
    np.testing.assert_array_equal(np.asarray(i), ei)


@cpu_only
@pytest.mark.parametrize("n,k,qn", [(512, 10, 1), (2048, 20, 3), (3000, 5, 8), (700, 13, 2)])
def test_topk_pallas_interpret_matches_oracle(n, k, qn):
    """Pallas kernel in interpreter mode (CPU) vs oracle, incl. ragged N."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((qn, 128)).astype(np.float32)
    m = rng.standard_normal((n, 128)).astype(np.float32)
    s, i = topk_pallas(jnp.asarray(q), jnp.asarray(m.T), k, tile_n=512, interpret=True)
    es, ei = _oracle(q, m, k)
    np.testing.assert_array_equal(np.asarray(i), ei)
    np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)


def test_topk_pallas_duplicate_scores_tiebreak():
    """Duplicate vectors must resolve ties to the lowest index, like a stable
    ORDER BY scan (image_database.py:1572)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 64)).astype(np.float32)
    m = np.tile(base, (64, 1))  # 256 rows, every score appears 64 times
    q = base[:1]
    s, i = topk_pallas(jnp.asarray(q), jnp.asarray(m.T), 8, tile_n=256, interpret=True)
    es, ei = _oracle(q, m, 8)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_k_larger_than_n():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    m = rng.standard_normal((5, 16)).astype(np.float32)
    s, i = cosine_topk(jnp.asarray(q), jnp.asarray(m.T), 10)
    assert s.shape == (1, 5)
    es, ei = _oracle(q, m, 10)
    np.testing.assert_array_equal(np.asarray(i), ei)


def test_empty_matrix():
    q = np.zeros((1, 16), np.float32)
    m = np.zeros((0, 16), np.float32)
    s, i = cosine_topk(jnp.asarray(q), jnp.asarray(m.T), 10)
    assert s.shape == (1, 0) and i.shape == (1, 0)
