"""Binary scores kernel + approx shortlist (the cascade prefilter's r3
redesign): raw-match-counts Pallas kernel, flat-index == original-column
contract, approx_max_k shortlist ordering, and the cascade integration.

Hardware numbers (scripts/probe_shortlist_reshape.py, grouped-resident
layout): 0.27 ms @1M / 1.92 ms @10M (~92% of HBM peak) vs 0.95 / 17.1 ms
for the XLA exact-top-640 path it replaces."""

import sqlite3

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ON_DEVICE

from tpuclip.ops.hamming import (
    BINARY_TILE_N,
    binary_scores_pallas,
    binary_shortlist_q1,
    pack_bits_to_words,
    pad_words_t,
)

DIM = 64
W = DIM // 32


def _oracle_scores(qwords, words, n_valid):
    """numpy popcount(q & row) per row; -inf beyond n_valid."""
    anded = words & qwords.reshape(1, -1)  # (N, W)
    bytes_ = np.ascontiguousarray(anded).view(np.uint8)
    counts = np.unpackbits(bytes_.reshape(len(words), -1), axis=1).sum(1)
    out = counts.astype(np.float64)
    return out[:n_valid]


@pytest.fixture()
def packed():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, (300, DIM), dtype=np.uint8)
    words = pack_bits_to_words(bits)  # (300, W) uint32
    qbits = rng.integers(0, 2, (1, DIM), dtype=np.uint8)
    qwords = pack_bits_to_words(qbits)
    return words, qwords


def test_binary_scores_pallas_matches_oracle(packed):
    words, qwords = packed
    wt, nv = pad_words_t(words)  # (W, 16384), nv=300
    scores = np.asarray(
        binary_scores_pallas(
            jnp.asarray(qwords), jnp.asarray(wt),
            n_valid=jnp.asarray(nv, jnp.int32), interpret=True,
        )
    )[0]
    assert scores.shape == (wt.shape[1],)
    ref = _oracle_scores(qwords, words, nv)
    np.testing.assert_array_equal(scores[:nv].astype(np.int64),
                                  ref.astype(np.int64))
    # padding columns are -inf, never selectable
    assert np.all(np.isneginf(scores[nv:]))


def test_binary_shortlist_q1_content_and_order(packed):
    words, qwords = packed
    wt, nv = pad_words_t(words)
    m = 50
    s, i = binary_shortlist_q1(
        jnp.asarray(qwords), jnp.asarray(wt), m,
        n_valid=jnp.asarray(nv, jnp.int32), interpret=True,
    )
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    assert s.shape == (m,)
    ref = _oracle_scores(qwords, words, nv)
    # returned scores are the true scores of the returned columns
    np.testing.assert_array_equal(s.astype(np.int64), ref[i].astype(np.int64))
    # ordering contract: score desc, idx asc within ties
    for a in range(m - 1):
        assert (s[a] > s[a + 1]) or (s[a] == s[a + 1] and i[a] < i[a + 1])
    # coverage: every row scoring strictly above the shortlist boundary is
    # in. On the real device approx_max_k's PartialReduce legitimately drops
    # a small fraction (measured 99.4-99.7% above-boundary coverage on v5e,
    # docs/benchmarks.md) — assert the documented floor there instead.
    t = s.min()
    above = set(np.nonzero(ref > t)[0].tolist())
    dropped = len(above - set(i.tolist()))
    if ON_DEVICE:
        # DIM=64 popcount scores are massively tied, the adversarial regime
        # for approx_max_k's PartialReduce — measured 7/49 above-boundary
        # drops on v5e at this shape (vs 0.3-0.6% at production scale,
        # where the cascade also oversamples 2x and exactly rescores).
        # Bound the drop so a catastrophic selection regression still fails.
        assert dropped <= max(2, int(0.2 * len(above))), (
            f"approx shortlist dropped {dropped}/{len(above)}"
        )
    else:
        assert dropped == 0


def test_binary_shortlist_q1_m_exceeds_valid_rows(packed):
    words, qwords = packed
    wt, nv = pad_words_t(words[:20])
    s, i = binary_shortlist_q1(
        jnp.asarray(qwords), jnp.asarray(wt), 64,
        n_valid=jnp.asarray(20, jnp.int32), interpret=True,
    )
    s = np.asarray(s)[0]
    # exactly the 20 real rows are finite; padding sorts last as -inf
    assert np.isfinite(s[:20]).all()
    assert np.all(np.isneginf(s[20:]))


def test_grouped_layout_agrees_with_words_t(packed):
    """The production device layout is the pre-grouped (W, 8, Np/8) form
    (pad_words_grouped) — every entry point must produce identical results
    from either layout (the 2D form retiles in-program on TPU, see
    scripts/probe_shortlist_reshape.py)."""
    from tpuclip.ops.hamming import (
        binary_topk_packed_pallas,
        binary_topk_packed_t,
        pad_words_grouped,
    )

    words, qwords = packed
    wt, nv = pad_words_t(words)
    wg, nv_g = pad_words_grouped(words)
    assert nv_g == nv
    assert wg.shape == (W, 8, wt.shape[1] // 8)
    np.testing.assert_array_equal(wg.reshape(W, -1), wt)
    nva = jnp.asarray(nv, jnp.int32)

    s2 = np.asarray(binary_scores_pallas(
        jnp.asarray(qwords), jnp.asarray(wt), n_valid=nva, interpret=True))
    s3 = np.asarray(binary_scores_pallas(
        jnp.asarray(qwords), jnp.asarray(wg), n_valid=nva, interpret=True))
    np.testing.assert_array_equal(s2, s3)

    a = binary_shortlist_q1(jnp.asarray(qwords), jnp.asarray(wt), 40,
                            n_valid=nva, interpret=True)
    b = binary_shortlist_q1(jnp.asarray(qwords), jnp.asarray(wg), 40,
                            n_valid=nva, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    # XLA exact path, masked and unmasked
    mask = np.zeros((wt.shape[1],), np.float32)
    mask[::4] = -np.inf
    for m in (None, jnp.asarray(mask)):
        a = binary_topk_packed_t(jnp.asarray(qwords), jnp.asarray(wt), 12,
                                 mask=m, n_valid=nva)
        b = binary_topk_packed_t(jnp.asarray(qwords), jnp.asarray(wg), 12,
                                 mask=m, n_valid=nva)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    # grouped-accepting Pallas top-k entry (q=1 kernel + q>1 XLA fallback)
    qmulti = pack_bits_to_words(
        np.random.default_rng(3).integers(0, 2, (3, DIM), dtype=np.uint8)
    )
    for q in (qwords, qmulti):
        a = binary_topk_packed_pallas(jnp.asarray(q), jnp.asarray(wt), 12,
                                      n_valid=nva, interpret=True)
        b = binary_topk_packed_pallas(jnp.asarray(q), jnp.asarray(wg), 12,
                                      n_valid=nva, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def _build_db(tmp_path, vecs, name="bs.db"):
    from tpuclip.index.store import MetadataStore

    store = MetadataStore(str(tmp_path / name), embedding_dim=DIM)
    store.init_schema(verbose=False)
    conn = sqlite3.connect(store.db_path)
    cur = conn.cursor()
    batch = [
        (f"/img/{i:04d}.jpg", float(i), f"h{i}", vecs[i])
        for i in range(len(vecs))
    ]
    store.commit_with_retry(cur, conn, batch, save_full_embeddings=True)
    conn.close()
    return store


def _force_grouped_layout(index):
    """Simulate the TPU-resident grouped word-major layout on the CPU backend
    so the scores prefilter path (gated to grouped/words_t) is exercisable in
    CI. No-op on the real device backend, where refresh() already built the
    grouped (W, 8, Np/8) form."""
    from tpuclip.ops.hamming import pad_words_grouped

    if getattr(index, "_bin_layout", None) == "grouped":
        return
    words = np.asarray(index._bin_matrix)  # rows layout: (N, W) uint32
    wg, nv = pad_words_grouped(words)
    index._bin_matrix = jnp.asarray(wg)
    index._bin_n_valid = jnp.asarray(nv, jnp.int32)
    index._bin_layout = "grouped"


def test_cascade_scores_prefilter_full_depth_equals_exact(tmp_path, monkeypatch):
    from tpuclip.index.search import DeviceIndex

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((400, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store = _build_db(tmp_path, vecs)

    monkeypatch.setenv("TPUCLIP_SEARCH_MODE", "cascade")
    monkeypatch.setenv("TPUCLIP_CASCADE_DEPTH", str(len(vecs)))
    monkeypatch.setenv("TPUCLIP_CASCADE_PREFILTER", "scores")
    casc = DeviceIndex(store)
    casc.refresh()
    _force_grouped_layout(casc)
    monkeypatch.delenv("TPUCLIP_SEARCH_MODE")
    monkeypatch.delenv("TPUCLIP_CASCADE_DEPTH")
    monkeypatch.delenv("TPUCLIP_CASCADE_PREFILTER")
    exact = DeviceIndex(store)

    rng = np.random.default_rng(9)
    for _ in range(3):
        q = rng.standard_normal(DIM).astype(np.float32)
        got = casc.search(q, 10)
        want = exact.search(q, 10)
        if ON_DEVICE:
            # Device reality: the scores prefilter is approx (PartialReduce
            # can drop a boundary row even at full depth) and the two paths
            # rescore in different exact arithmetics (host fp32 vs device
            # bf16-rounded) — assert recall + loose scores; equality on CPU.
            overlap = len({p for p, _ in got} & {p for p, _ in want})
            assert overlap >= 9, f"cascade vs exact overlap {overlap}/10"
            np.testing.assert_allclose(
                sorted(s for _, s in got), sorted(s for _, s in want),
                rtol=5e-3, atol=1e-3,
            )
        else:
            assert [p for p, _ in got] == [p for p, _ in want]
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want], rtol=1e-5
            )
    assert casc._matrix is None and casc._cascade


def test_cascade_scores_prefilter_partial_depth(tmp_path, monkeypatch):
    """Partial-depth approx prefilter: 2x-oversampled rescore keeps recall
    at least in the exact prefilter's neighborhood."""
    from tpuclip.index.search import DeviceIndex

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((500, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store = _build_db(tmp_path, vecs)

    monkeypatch.setenv("TPUCLIP_SEARCH_MODE", "cascade")
    monkeypatch.setenv("TPUCLIP_CASCADE_DEPTH", "100")
    monkeypatch.setenv("TPUCLIP_CASCADE_PREFILTER", "scores")
    casc = DeviceIndex(store)
    casc.refresh()
    _force_grouped_layout(casc)
    monkeypatch.delenv("TPUCLIP_SEARCH_MODE")
    monkeypatch.delenv("TPUCLIP_CASCADE_DEPTH")
    monkeypatch.delenv("TPUCLIP_CASCADE_PREFILTER")
    exact = DeviceIndex(store)

    rng = np.random.default_rng(10)
    recalls = []
    for _ in range(5):
        q = rng.standard_normal(DIM).astype(np.float32)
        got = {p for p, _ in casc.search(q, 10)}
        want = {p for p, _ in exact.search(q, 10)}
        recalls.append(len(got & want) / 10.0)
    assert float(np.mean(recalls)) >= 0.5