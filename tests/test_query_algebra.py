"""Query algebra unit tests incl. the zero-norm fallbacks
(image_database.py:545-604, :1379-1396)."""

import numpy as np

from tpuclip.pipelines.search import apply_negative_embeddings, combine_embeddings


def _unit(v):
    return v / np.linalg.norm(v)


def test_combine_normalizes_weights():
    rng = np.random.default_rng(0)
    e1, e2 = _unit(rng.standard_normal(16)), _unit(rng.standard_normal(16))
    out = combine_embeddings(e1, e2, (2.0, 6.0))  # normalized to 0.25/0.75
    expect = _unit(0.25 * e1 + 0.75 * e2)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_combine_zero_weights_defaults_to_half():
    rng = np.random.default_rng(1)
    e1, e2 = _unit(rng.standard_normal(16)), _unit(rng.standard_normal(16))
    out = combine_embeddings(e1, e2, (0.0, 0.0))
    expect = _unit(0.5 * e1 + 0.5 * e2)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_combine_zero_norm_falls_back_to_first():
    e1 = _unit(np.ones(8, np.float32))
    e2 = -e1  # blend cancels exactly
    out = combine_embeddings(e1, e2, (0.5, 0.5))
    np.testing.assert_allclose(out, e1)


def test_negative_subtraction_and_renorm():
    rng = np.random.default_rng(2)
    e = _unit(rng.standard_normal(16))
    neg = _unit(rng.standard_normal(16))
    out = apply_negative_embeddings(e, [neg], [0.5], e, None, (0.5, 0.5))
    expect = _unit(e - 0.5 * neg)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-6)


def test_multiple_negatives_sum():
    rng = np.random.default_rng(3)
    e = _unit(rng.standard_normal(16))
    n1, n2 = _unit(rng.standard_normal(16)), _unit(rng.standard_normal(16))
    out = apply_negative_embeddings(e, [n1, n2], [0.3, 0.7], e, None, (0.5, 0.5))
    expect = _unit(e - 0.3 * n1 - 0.7 * n2)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_negative_zero_norm_restores_single_query():
    """e - 1.0*e == 0 → restore embedding1 (image_database.py:560-564)."""
    e = _unit(np.ones(8, np.float32))
    out = apply_negative_embeddings(e.copy(), [e], [1.0], e, None, (0.5, 0.5))
    np.testing.assert_allclose(out, e)


def test_negative_zero_norm_restores_blend():
    """Zero norm with a second query restores the normalized blend
    (image_database.py:565-571)."""
    rng = np.random.default_rng(4)
    e1, e2 = _unit(rng.standard_normal(16)), _unit(rng.standard_normal(16))
    blend = _unit(0.25 * e1 + 0.75 * e2)
    out = apply_negative_embeddings(blend.copy(), [blend], [1.0], e1, e2, (1.0, 3.0))
    np.testing.assert_allclose(out, _unit(0.25 * e1 + 0.75 * e2), rtol=1e-6)
