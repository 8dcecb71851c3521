"""End-to-end pipeline tests on a synthetic image tree (SURVEY.md §4.3):
scan → search round trip, resume semantics, sequence sampling, exclusion,
duplicate filtering, binary-only mode — tiny random-weight model on CPU."""

import os
import sqlite3
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import tpuclip.engine as engine_mod
from tpuclip.engine import ImageDatabase


def _write_image(path: Path, color, size=(64, 48)):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Synthetic tree: normal photos, a 250-frame sequence folder, an
    excluded dir, and an exact duplicate pair."""
    root = tmp_path_factory.mktemp("images")
    _write_image(root / "photos" / "red.jpg", (220, 30, 30))
    _write_image(root / "photos" / "green.png", (30, 200, 30))
    _write_image(root / "photos" / "blue.webp", (30, 30, 220))
    _write_image(root / "photos" / "red_copy.jpg", (220, 30, 30))  # duplicate of red
    _write_image(root / "skipme" / "secret.jpg", (0, 0, 0))
    for i in range(250):
        _write_image(root / "frames_render" / f"frame_{i:04d}.jpg", (i % 255, 100, 100), size=(32, 32))
    _write_image(root / "frames_render" / "notes.png", (255, 255, 0), size=(32, 32))
    return root


@pytest.fixture(scope="module")
def db(tree, tmp_path_factory):
    home = tmp_path_factory.mktemp("home")
    os.environ["TPUCLIP_HOME"] = str(home)
    eng = ImageDatabase(
        db_path=str(home / "test.db"),
        model_cache_dir=str(home / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=8,
    )
    eng.scan_directory(
        str(tree),
        batch_size=10,
        inference_batch_size=8,
        exclude_paths=[str(tree / "skipme")],
        profile=True,
    )
    return eng


def test_scan_counts(db, tree):
    # photos: 4, frames: every 100th of 250 numbered (3) + notes.png (1) = 4
    assert db.store.count_images() == 8
    full, binary = db.store.count_embeddings()
    assert full == 8 and binary == 8


def test_excluded_dir_not_indexed(db, tree):
    conn = sqlite3.connect(db.db_path)
    paths = [r[0] for r in conn.execute("SELECT file_path FROM images")]
    conn.close()
    assert not any("skipme" in p for p in paths)


def test_sequence_sampling_applied(db):
    conn = sqlite3.connect(db.db_path)
    frames = [
        r[0] for r in conn.execute("SELECT file_path FROM images WHERE file_path LIKE '%/frame\\_%' ESCAPE '\\'")
    ]
    conn.close()
    # 250 frames sampled at stride 100 → frames 0, 100, 200
    assert len(frames) == 3
    nums = sorted(int(Path(f).stem.split("_")[1]) for f in frames)
    assert nums == [0, 100, 200]


def test_embeddings_are_unit_norm(db):
    ids, mat = db.index.cache.load()
    norms = np.linalg.norm(np.asarray(mat), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_resume_skips_processed(db, tree, capsys):
    before = db.store.count_images()
    db.scan_directory(str(tree), exclude_paths=[str(tree / "skipme")])
    assert db.store.count_images() == before  # nothing re-processed


def test_text_search_round_trip(db):
    results = db.search("a red square", k=5, show_duplicates=True)
    assert len(results) == 5
    paths = [p for p, _ in results]
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.001 <= s <= 1.001 for s in scores)
    assert len(set(paths)) == len(paths)


def test_image_search_finds_duplicate_first(db, tree):
    """Image query with the exact red.jpg must rank red.jpg/red_copy.jpg top-2
    (identical pixels → identical embeddings)."""
    results = db.search(
        str(tree / "photos" / "red.jpg"), k=4, is_image_path=True, show_duplicates=True
    )
    top2 = {Path(p).name for p, _ in results[:2]}
    assert top2 == {"red.jpg", "red_copy.jpg"}
    assert results[0][1] > 0.999  # self-similarity ~1


def test_duplicate_filter_removes_copy(db, tree):
    shown = db.search(str(tree / "photos" / "red.jpg"), k=4, is_image_path=True, show_duplicates=True)
    filtered = db.search(str(tree / "photos" / "red.jpg"), k=4, is_image_path=True, show_duplicates=False)
    names_shown = {Path(p).name for p, _ in shown}
    names_filtered = {Path(p).name for p, _ in filtered}
    assert {"red.jpg", "red_copy.jpg"} <= names_shown
    assert len({"red.jpg", "red_copy.jpg"} & names_filtered) == 1


def test_folder_filter(db, tree):
    results = db.search(
        "anything", k=10, filter_folders=[str(tree / "photos")], show_duplicates=True
    )
    assert results
    assert all(str(tree / "photos") in p for p, _ in results)


def test_combined_and_negative_queries(db):
    r1 = db.search("red square + green square", k=3, show_duplicates=True)
    assert len(r1) == 3
    r2 = db.search("red square", k=3, negative_query="green", negative_weight=0.5, show_duplicates=True)
    assert len(r2) == 3
    r3 = db.search(
        "red square", k=3,
        negative_queries=["green", "blue"], negative_is_images=[False, False],
        negative_weights=[0.3, 0.3], show_duplicates=True,
    )
    assert len(r3) == 3


def test_search_results_match_numpy_oracle(db):
    """Device top-k must equal a host-side brute-force over the same matrix."""
    q = db._get_text_embedding("a red square")
    ids, mat = db.index.cache.load()
    scores = np.asarray(mat, np.float32) @ q
    order = np.argsort(-scores)[:5]
    expected_ids = [int(ids[i]) for i in order]
    paths = db.store.fetch_paths_for_ids(expected_ids)
    expected = [paths[i] for i in expected_ids]
    got = [p for p, _ in db.search("a red square", k=5, show_duplicates=True)]
    # bf16/f32 rounding may swap near-ties; compare as sets and top-1
    assert set(got) == set(expected)
    assert got[0] == expected[0]


def test_binary_only_mode(tree, tmp_path):
    eng = ImageDatabase(
        db_path=str(tmp_path / "bin.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=8,
    )
    eng.scan_directory(
        str(tree / "photos"), save_full_embeddings=False, inference_batch_size=8
    )
    full, binary = eng.store.count_embeddings()
    assert full == 0 and binary == 4
    results = eng.search("red", k=3, show_duplicates=True)
    assert len(results) == 3
    # binary scores are matches/dim in [0, 1]
    assert all(0.0 <= s <= 1.0 for _, s in results)


def test_oversized_index_degrades_to_binary(db, monkeypatch, capsys):
    """A flat matrix over the HBM cap must skip the device upload with a
    loud hint (cascade/sharded/ivf) and serve from the binary index —
    graceful degradation instead of an opaque device OOM."""
    from tpuclip.index.search import DeviceIndex

    monkeypatch.setenv("TPUCLIP_INDEX_HBM_GB", "0.0000001")
    monkeypatch.setenv("TPUCLIP_QUIET", "0")  # conftest silences log()
    idx = DeviceIndex(db.store)
    idx.refresh()
    assert idx._matrix is None
    assert idx._bin_matrix is not None
    out = capsys.readouterr().out
    assert "too large" in out and "cascade" in out
    q = np.random.default_rng(3).standard_normal(db.embedding_dim)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    results = idx.search(q, 3)
    assert len(results) == 3

    monkeypatch.delenv("TPUCLIP_INDEX_HBM_GB")
    ok = DeviceIndex(db.store)
    ok.refresh()
    assert ok._matrix is not None  # cap lifted -> flat matrix resident again


def test_int8_precision_index(db, tree):
    """int8 search mode must return the same top results on this tiny DB."""
    from tpuclip.index.search import DeviceIndex

    exact = db.search("a red square", k=5, show_duplicates=True)
    idx8 = DeviceIndex(db.store, precision="int8")
    q = db._get_text_embedding("a red square")
    got = idx8.search(q, 5)
    assert [p for p, _ in got] == [p for p, _ in exact]
    for (_, s8), (_, se) in zip(got, exact):
        assert abs(s8 - se) < 0.02


def test_gallery_generation(db, tmp_path):
    results = db.search("a red square", k=3, show_duplicates=True)
    out = tmp_path / "g.html"
    db.generate_html_gallery(results, str(out), query="a red square")
    html = out.read_text()
    assert "a red square" in html
    assert "Similarity:" in html
    assert "localexplorer:" in html
    assert html.count('class="result-item"') == len(results)


def test_text_embedding_cache(db):
    a = db._get_text_embedding("cache probe")
    b = db._get_text_embedding("cache probe")
    np.testing.assert_array_equal(a, b)
    # cached copies must be independent (callers mutate query vectors in the
    # negative-prompt algebra)
    a[: 4] = 0
    c = db._get_text_embedding("cache probe")
    assert not np.array_equal(a[:4], c[:4])
