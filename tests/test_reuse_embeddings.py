"""Scan-time embedding reuse (`scan --reuse-embeddings`): byte-identical
files skip decode AND the device pass, committing the already-indexed
embedding under the new path. Covers the moved/copied-library rescan the
(path, mtime) resume check cannot."""

import shutil
import sqlite3
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase
from tpuclip.index.store import MetadataStore, connect


def _write_image(path: Path, color, size=(64, 48)):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture()
def engine(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    return ImageDatabase(
        db_path=str(tmp_path / "r.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )


def _vectors_by_hash(db_path):
    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT i.file_path, i.file_hash, e.vector FROM images i "
        "JOIN embeddings e ON e.image_id = i.id"
    ).fetchall()
    conn.close()
    return rows


def test_copied_tree_rescans_without_device(tmp_path, engine, monkeypatch):
    src = tmp_path / "lib_a"
    for i in range(5):
        _write_image(src / f"img_{i}.jpg", (40 * i % 255, 90, 120))
    engine.scan_directory(str(src), batch_size=10)

    # "Reorganized library": byte-identical copies under new names/paths.
    dst = tmp_path / "lib_b"
    dst.mkdir()
    for i, p in enumerate(sorted(src.iterdir())):
        shutil.copyfile(p, dst / f"renamed_{i}.jpg")

    import tpuclip.models.siglip as siglip_mod

    def boom(*a, **k):
        raise AssertionError("device embed must not run for an all-reuse scan")

    monkeypatch.setattr(siglip_mod, "get_image_features", boom)
    engine.scan_directory(str(dst), batch_size=10, reuse_embeddings=True)

    rows = _vectors_by_hash(engine.db_path)
    by_hash = {}
    for path, h, blob in rows:
        by_hash.setdefault(h, []).append((path, blob))
    dst_rows = [r for r in rows if str(dst) in r[0]]
    assert len(dst_rows) == 5
    for h, entries in by_hash.items():
        assert len(entries) == 2  # original + copy
        assert entries[0][1] == entries[1][1]  # bit-identical stored vectors


def test_mixed_new_and_copied_files(tmp_path, engine, monkeypatch):
    src = tmp_path / "one"
    _write_image(src / "a.jpg", (10, 200, 10))
    _write_image(src / "b.jpg", (200, 10, 10))
    engine.scan_directory(str(src), batch_size=10)

    mixed = tmp_path / "two"
    mixed.mkdir()
    shutil.copyfile(src / "a.jpg", mixed / "copy_of_a.jpg")
    _write_image(mixed / "brand_new.jpg", (5, 5, 250))

    import tpuclip.models.siglip as siglip_mod

    real = siglip_mod.get_image_features
    calls = {"n": 0}

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(siglip_mod, "get_image_features", counting)
    engine.scan_directory(str(mixed), batch_size=10, reuse_embeddings=True)
    assert calls["n"] == 1  # one batch containing only the genuinely new file

    rows = _vectors_by_hash(engine.db_path)
    paths = {r[0] for r in rows}
    assert str(mixed / "copy_of_a.jpg") in {str(Path(p)) for p in paths}
    assert str(mixed / "brand_new.jpg") in {str(Path(p)) for p in paths}
    # the copy's stored vector matches the original's bit-for-bit
    blobs = {Path(p).name: blob for p, _, blob in rows}
    assert blobs["copy_of_a.jpg"] == blobs["a.jpg"]


def test_reuse_noop_for_binary_only(tmp_path, engine):
    src = tmp_path / "bin"
    _write_image(src / "x.jpg", (1, 2, 3))
    # binary-only + reuse: the lookup is disabled (no full rows to reuse);
    # the scan must still complete.
    engine.scan_directory(
        str(src), batch_size=10, save_full_embeddings=False, reuse_embeddings=True
    )
    conn = sqlite3.connect(engine.db_path)
    n = conn.execute(
        "SELECT COUNT(*) FROM images WHERE file_path LIKE ?", (str(src) + "%",)
    ).fetchone()[0]
    conn.close()
    assert n == 1


def test_fetch_embedding_by_hash(tmp_path):
    store = MetadataStore(str(tmp_path / "s.db"), embedding_dim=8)
    store.init_schema(verbose=False)
    vec = np.arange(8, dtype=np.float32)
    conn = connect(store.db_path)
    cur = conn.cursor()
    store.commit_with_retry(
        cur, conn, [("/p/a.jpg", 0.0, "hash_a", vec)], save_full_embeddings=True
    )
    # binary-only row: must NOT qualify for reuse
    store.commit_with_retry(
        cur, conn, [("/p/b.jpg", 0.0, "hash_b", vec * 2)], save_full_embeddings=False
    )
    got_vec, got_blob = store.fetch_embedding_by_hash(cur, "hash_a")
    np.testing.assert_array_equal(got_vec, vec)
    assert got_blob == (vec >= 0).astype(np.uint8).tobytes()
    assert store.fetch_embedding_by_hash(cur, "hash_b") is None
    assert store.fetch_embedding_by_hash(cur, "missing") is None
    conn.close()


def test_reuse_preserves_binary_blob_for_int8_storage(tmp_path, monkeypatch):
    """With int8-stored vectors, deriving sign bits from the dequantized
    embedding flips near-zero dims — enough to push an exact copy past the
    duplicate filter's 2-bit tolerance. Reuse must copy the SOURCE row's
    binary blob verbatim."""
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("TPUCLIP_VECTOR_DTYPE", "int8")
    engine = ImageDatabase(
        db_path=str(tmp_path / "q.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    src = tmp_path / "one"
    _write_image(src / "a.jpg", (120, 64, 33))
    engine.scan_directory(str(src), batch_size=10)
    dst = tmp_path / "two"
    dst.mkdir()
    shutil.copyfile(src / "a.jpg", dst / "copy.jpg")
    engine.scan_directory(str(dst), batch_size=10, reuse_embeddings=True)

    conn = sqlite3.connect(engine.db_path)
    blobs = {
        Path(p).name: b
        for p, b in conn.execute(
            "SELECT i.file_path, be.embedding FROM images i "
            "JOIN binary_embeddings be ON be.image_id = i.id"
        )
    }
    conn.close()
    assert blobs["copy.jpg"] == blobs["a.jpg"]


def test_hash_index_is_lazy(tmp_path):
    """The content-hash index is a reuse-only cost: absent after plain
    schema init (no per-insert maintenance for scans that never reuse),
    created by ensure_hash_index when the reuse setup runs."""
    store = MetadataStore(str(tmp_path / "i.db"), embedding_dim=8)
    store.init_schema(verbose=False)

    def index_names():
        conn = sqlite3.connect(store.db_path)
        names = {r[0] for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='index'"
        )}
        conn.close()
        return names

    assert "idx_images_file_hash" not in index_names()
    conn = connect(store.db_path)
    store.ensure_hash_index(conn)
    conn.close()
    assert "idx_images_file_hash" in index_names()
