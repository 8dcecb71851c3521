"""Differential parity: run the REFERENCE implementation's pure functions
side-by-side with tpuclip's on randomized inputs.

The reference (/root/reference/image_database.py) is imported with a stub for
its one unconditionally-imported missing dependency (sqlite_vec); everything
else it needs (torch, transformers, PIL, tqdm, numpy) is present. Tests skip
cleanly when the reference tree isn't available.

Covered contracts:
- sequence sampler (image_database.py:606-690)
- query algebra: positive blend + negative subtraction w/ zero-norm fallback
  (:545-604, :1379-1396)
- output filename sanitizer + auto-increment (:1854-1888)
- duplicate filter over a shared SQLite DB (:1207-1306) — also proves the
  binary_embeddings on-disk format is byte-compatible both ways
- file hasher (:346-352)
"""

from __future__ import annotations

import importlib.util
import os
import random
import sqlite3
import sys
import types
from pathlib import Path, PureWindowsPath

import numpy as np
import pytest

REF_PATH = "/root/reference/image_database.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference module once (heavy: pulls torch/transformers)."""
    if "sqlite_vec" not in sys.modules:
        stub = types.ModuleType("sqlite_vec")
        stub.load = lambda conn: None
        stub.serialize_float32 = lambda v: np.asarray(v, np.float32).tobytes()
        sys.modules["sqlite_vec"] = stub
    spec = importlib.util.spec_from_file_location("reference_image_database", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Shim:
    """Minimal ``self`` for the reference's methods (only db_path is read)."""

    def __init__(self, db_path=""):
        self.db_path = db_path


# ---------------------------------------------------------------- sampler


def _random_folder_case(rng: random.Random, case_id: int):
    """One synthetic folder listing exercising the sampler's branches:
    size threshold (150), folder-name keywords, dominant-prefix ratio (0.8),
    camera prefixes, numeric-suffix parsing, non-numbered keeps."""
    folder_names = [
        "frames", "render_output", "my_sequence", "anim2024", "holiday",
        "photos", "video_caps", "motion_test", "stuff", "seq", "Camera",
    ]
    prefixes = [
        "frame_", "render", "IMG_", "DSC_", "PXL_", "shot", "f", "",
        "clip.", "take-",
    ]
    folder = Path(f"/data/{rng.choice(folder_names)}_{case_id}")
    n = rng.choice([10, 140, 151, 160, 300, 450])
    dominant = rng.choice(prefixes)
    dominance = rng.choice([0.5, 0.75, 0.79, 0.8, 0.85, 1.0])
    pad = rng.choice([0, 4, 6])
    files = []
    for i in range(n):
        if rng.random() < dominance:
            stem = f"{dominant}{i:0{pad}d}" if pad else f"{dominant}{i}"
        elif rng.random() < 0.5:
            stem = f"{rng.choice(prefixes)}{rng.randrange(10_000)}"
        else:
            stem = f"notes_{chr(97 + i % 26)}"  # non-numbered
        files.append(folder / f"{stem}.jpg")
    rng.shuffle(files)
    return files


def test_sequence_sampler_differential(ref):
    from tpuclip.io.walker import sample_folder_sequences

    rng = random.Random(1234)
    for case_id in range(60):
        files = _random_folder_case(rng, case_id)
        got = [str(p) for p in sample_folder_sequences(list(files))]
        want = [str(p) for p in ref.ImageDatabase._sample_folder_sequences(_Shim(), list(files))]
        assert got == want, f"case {case_id}: {len(got)} vs {len(want)} files kept"


# ------------------------------------------------------------ query algebra


def test_query_algebra_differential(ref):
    from tpuclip.pipelines.search import apply_negative_embeddings, combine_embeddings

    rng = np.random.default_rng(7)
    d = 64
    for trial in range(40):
        e1 = rng.standard_normal(d).astype(np.float32)
        e1 /= np.linalg.norm(e1)
        use_e2 = trial % 2 == 0
        e2 = None
        weights = (1.0, 0.0)
        if use_e2:
            e2 = rng.standard_normal(d).astype(np.float32)
            e2 /= np.linalg.norm(e2)
            weights = (float(rng.uniform(0.1, 3.0)), float(rng.uniform(0.1, 3.0)))
            blend = combine_embeddings(e1, e2, weights)
        else:
            blend = e1.copy()

        n_negs = trial % 4  # 0..3 negatives
        negs = [rng.standard_normal(d).astype(np.float32) for _ in range(n_negs)]
        negs = [v / np.linalg.norm(v) for v in negs]
        neg_ws = [float(rng.uniform(0.1, 2.0)) for _ in negs]
        if trial % 5 == 0 and n_negs == 1:
            # Force the zero-norm fallback branch: neg == blend / weight.
            negs = [blend / neg_ws[0]]

        if n_negs == 1:
            want = ref.ImageDatabase._apply_negative_embedding(
                _Shim(), blend.copy(), negs[0], neg_ws[0], e1, e2, weights
            )
        elif n_negs > 1:
            want = ref.ImageDatabase._apply_multiple_negative_embeddings(
                _Shim(), blend.copy(), list(negs), list(neg_ws), e1, e2, weights
            )
        else:
            want = blend
        got = apply_negative_embeddings(
            blend.copy(), list(negs), list(neg_ws), e1, e2, weights
        ) if n_negs else blend
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_positive_blend_differential(ref):
    """The inline blend at image_database.py:1379-1396 (not a function there):
    replicate its arithmetic literally and compare to combine_embeddings,
    including the zero-total-weight and zero-norm fallbacks."""
    from tpuclip.pipelines.search import combine_embeddings

    rng = np.random.default_rng(11)
    d = 32
    for trial in range(30):
        e1 = rng.standard_normal(d).astype(np.float32)
        e1 /= np.linalg.norm(e1)
        e2 = rng.standard_normal(d).astype(np.float32)
        e2 /= np.linalg.norm(e2)
        w = (float(rng.uniform(0, 2)), float(rng.uniform(0, 2)))
        if trial == 0:
            w = (0.0, 0.0)
        if trial == 1:
            e2 = -e1
            w = (1.0, 1.0)  # exact cancellation -> zero-norm fallback
        # Literal reference arithmetic (:1379-1396)
        total = w[0] + w[1]
        ww = (0.5, 0.5) if total == 0 else (w[0] / total, w[1] / total)
        combined = ww[0] * e1 + ww[1] * e2
        norm = np.linalg.norm(combined)
        want = combined / norm if norm > 0 else e1
        got = combine_embeddings(e1, e2, w)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------- output namer


def test_output_filename_differential(ref, tmp_path):
    from tpuclip.gallery.html import generate_output_filename

    queries = [
        ("a red car", False),
        ('weird <>:"/\\|?* chars', False),
        ("x" * 150, False),
        ("  spaces   everywhere  ", False),
        ("café ☕ unicode", False),
        ("trailing.dot.", False),
        ("/home/user/photos/my image.jpg", True),
        (str(PureWindowsPath("C:/Users/me/pic.png")), True),
        ("", False),
    ]
    for i, (q, is_img) in enumerate(queries):
        ours_dir = tmp_path / f"ours_{i}"
        refs_dir = tmp_path / f"refs_{i}"
        ours_dir.mkdir()
        refs_dir.mkdir()
        for round_ in range(3):  # third call exercises auto-increment _2, _3
            got = generate_output_filename(q, is_image_path=is_img, results_dir=ours_dir)
            want = ref.generate_output_filename(q, is_image_path=is_img, results_dir=refs_dir)
            assert Path(got).name == Path(want).name, (q, round_)
            Path(got).write_text("x")
            Path(want).write_text("x")


# --------------------------------------------------------- duplicate filter


def _make_db(tmp_path, rows):
    """Build a DB with OUR store's schema and the given (path, bits) rows —
    the reference then reads it directly, proving format compatibility."""
    from tpuclip.index.store import MetadataStore

    db = str(tmp_path / "diff.db")
    store = MetadataStore(db, embedding_dim=len(rows[0][1]))
    store.init_schema()
    conn = sqlite3.connect(db)
    for i, (path, bits) in enumerate(rows):
        conn.execute(
            "INSERT INTO images (id, file_path, file_hash, last_modified) VALUES (?, ?, ?, ?)",
            (i + 1, path, f"h{i}", 0.0),
        )
        conn.execute(
            "INSERT INTO binary_embeddings (image_id, embedding) VALUES (?, ?)",
            (i + 1, np.asarray(bits, np.uint8).tobytes()),
        )
    conn.commit()
    conn.close()
    return db, store


def test_duplicate_filter_differential(ref, tmp_path):
    from tpuclip.index.dedup import filter_duplicates

    rng = np.random.default_rng(3)
    d = 128
    # Clusters of near-duplicates: champion + members within <=2 flipped bits,
    # plus singletons and a no-binary-row path.
    rows, results = [], []
    sim = 0.99
    for c in range(6):
        base = rng.integers(0, 2, d).astype(np.uint8)
        for m in range(c % 3 + 1):
            bits = base.copy()
            flip = rng.choice(d, size=m % 4, replace=False)
            bits[flip] ^= 1
            path = f"/img/c{c}_m{m}.jpg"
            rows.append((path, bits))
            results.append((path, round(sim, 4)))
            sim -= 0.01
    results_sorted = sorted(results, key=lambda x: x[1], reverse=True)

    db, store = _make_db(tmp_path, rows)
    want = ref.ImageDatabase._filter_duplicates(
        _Shim(db), list(results_sorted), tolerance_bits=2
    )
    got = filter_duplicates(store, list(results_sorted), tolerance_bits=2)
    assert [(p, round(s, 4)) for p, s in got] == [
        (p, round(s, 4)) for p, s in want
    ]

    # A result with no DB row must be kept by both.
    extra = results_sorted + [("/img/unknown.jpg", 0.5)]
    want = ref.ImageDatabase._filter_duplicates(_Shim(db), list(extra), tolerance_bits=2)
    got = filter_duplicates(store, list(extra), tolerance_bits=2)
    assert sorted(p for p, _ in got) == sorted(p for p, _ in want)


# ---------------------------------------------------------------- file hash


def test_file_hash_differential(ref, tmp_path):
    from tpuclip.io.hashing import file_sha256

    p = tmp_path / "blob.bin"
    p.write_bytes(np.random.default_rng(0).bytes(100_000))
    assert file_sha256(str(p)) == ref.ImageDatabase._get_file_hash(_Shim(), str(p))


# ------------------------------------------------------------- HTML gallery


def _extract_cards(html: str):
    """Structural view of a gallery: per-card (img src, open/folder links,
    filename, path, similarity) plus the query banner text."""
    import html as html_mod
    import re

    cards = []
    for m in re.finditer(
        r'<img src="([^"]*)" alt="([^"]*)"[\s\S]*?'
        r'Similarity: (-?[0-9.]+)[\s\S]*?'
        r'<a href="([^"]*)">Open Image</a>\s*'
        r'<a href="([^"]*)"[^>]*>Open Folder</a>',
        html,
    ):
        cards.append(tuple(html_mod.unescape(g) for g in m.groups()))
    query = re.search(r'<div class="query">([\s\S]*?)</div>', html)
    return cards, (html_mod.unescape(query.group(1)).strip() if query else None)


def test_html_gallery_differential(ref, tmp_path):
    """Same structural gallery (image URLs incl. Windows drive-letter and
    relative forms, localexplorer links, 4-dp scores, query banner) for
    escape-neutral inputs; ours additionally HTML-escapes, so comparison is
    on the unescaped structure."""
    from tpuclip.gallery.html import generate_html_gallery

    results = [
        ("/abs/unix path/img one.jpg", 0.91234567),
        ("C:\\Photos\\vacation\\beach.png", 0.85),
        ("relative/dir/pic.webp", 0.5),
        ("/negative/score.gif", -0.125),
    ]
    ours_file = tmp_path / "ours.html"
    refs_file = tmp_path / "refs.html"
    generate_html_gallery(list(results), str(ours_file), query="red car + sunset")
    ref.ImageDatabase.generate_html_gallery(
        _Shim(), list(results), str(refs_file), query="red car + sunset"
    )
    got_cards, got_query = _extract_cards(ours_file.read_text(encoding="utf-8"))
    want_cards, want_query = _extract_cards(refs_file.read_text(encoding="utf-8"))
    assert len(want_cards) == len(results)  # the regex really matched the ref
    assert got_cards == want_cards
    assert got_query == want_query


def test_filter_duplicates_many_matches_per_request(ref, tmp_path):
    """The serve micro-batcher's batched dedup (one binary fetch per
    window, r5) must return exactly what the per-request filter returns
    for every list."""
    from tpuclip.index.dedup import filter_duplicates, filter_duplicates_many

    rng = np.random.default_rng(9)
    d = 128
    rows, pool = [], []
    for i in range(12):
        base = rng.integers(0, 2, d).astype(np.uint8)
        rows.append((f"/img/b{i}.jpg", base))
        pool.append((f"/img/b{i}.jpg", round(0.9 - i * 0.01, 4)))
        near = base.copy()
        near[rng.choice(d, 2, replace=False)] ^= 1
        rows.append((f"/img/b{i}_dup.jpg", near))
        pool.append((f"/img/b{i}_dup.jpg", round(0.89 - i * 0.01, 4)))
    _db, store = _make_db(tmp_path, rows)

    lists = [
        sorted(pool[:10], key=lambda x: x[1], reverse=True),
        sorted(pool[6:20], key=lambda x: x[1], reverse=True),
        [],
        [("/img/missing.jpg", 0.5)] + pool[:4],
    ]
    batched = filter_duplicates_many(store, [list(x) for x in lists])
    singles = [filter_duplicates(store, list(x)) for x in lists]
    assert batched == singles
