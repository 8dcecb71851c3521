"""Interrupt/resume semantics (image_database.py:1035-1053, :692-720):
Ctrl-C mid-scan must flush pending work, and re-running the same scan must
skip everything already committed and finish the rest."""

import sqlite3
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "imgs"
    for i in range(20):
        p = root / f"folder{i % 4}" / f"img_{i:03d}.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (40, 40), ((i * 12) % 255, 80, 120)).save(p)
    return root


def test_interrupt_flushes_and_resume_completes(tree, tmp_path, monkeypatch):
    eng = ImageDatabase(
        db_path=str(tmp_path / "r.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )

    import tpuclip.models.siglip as siglip_mod

    real = siglip_mod.get_image_features
    calls = {"n": 0}

    def interrupting(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:  # two batches succeed, third "Ctrl-C"s
            raise KeyboardInterrupt
        return real(*args, **kwargs)

    monkeypatch.setattr(siglip_mod, "get_image_features", interrupting)
    eng.scan_directory(str(tree), batch_size=4, inference_batch_size=4)
    monkeypatch.setattr(siglip_mod, "get_image_features", real)

    partial = eng.store.count_images()
    assert 0 < partial < 20, f"expected a partial scan, got {partial}"
    # whatever was committed has embeddings (flush-on-interrupt)
    full, binary = eng.store.count_embeddings()
    assert full == partial and binary == partial

    # resume: same command completes the rest, skipping what's done
    eng.scan_directory(str(tree), batch_size=4, inference_batch_size=4)
    assert eng.store.count_images() == 20
    full, binary = eng.store.count_embeddings()
    assert full == 20 and binary == 20

    # resumed rows must not have been recomputed: embeddings of originally
    # committed rows are unchanged (idempotent commits)
    conn = sqlite3.connect(eng.db_path)
    n_rows = conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    conn.close()
    assert n_rows == 20


def test_modified_file_is_rescanned(tree, tmp_path):
    eng = ImageDatabase(
        db_path=str(tmp_path / "m.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(tree), inference_batch_size=4)
    target = next((tree / "folder0").glob("*.png"))

    conn = sqlite3.connect(eng.db_path)
    old_vec = conn.execute(
        "SELECT e.vector FROM embeddings e JOIN images i ON e.image_id = i.id "
        "WHERE i.file_path = ?", (str(target),),
    ).fetchone()[0]
    conn.close()

    # touch with different content AND a different mtime
    import os
    import time

    Image.new("RGB", (40, 40), (250, 250, 5)).save(target)
    os.utime(target, (time.time() + 100, time.time() + 100))

    eng.scan_directory(str(tree), inference_batch_size=4)
    conn = sqlite3.connect(eng.db_path)
    new_vec = conn.execute(
        "SELECT e.vector FROM embeddings e JOIN images i ON e.image_id = i.id "
        "WHERE i.file_path = ?", (str(target),),
    ).fetchone()[0]
    count = conn.execute("SELECT COUNT(*) FROM images").fetchone()[0]
    conn.close()
    assert count == 20  # INSERT OR REPLACE: still one row per path
    a = np.frombuffer(old_vec, np.float32)
    b = np.frombuffer(new_vec, np.float32)
    assert not np.allclose(a, b), "modified file must be re-embedded"

    # no orphaned embedding rows from the replaced id
    conn = sqlite3.connect(eng.db_path)
    orphans = conn.execute(
        "SELECT COUNT(*) FROM embeddings e LEFT JOIN images i ON e.image_id = i.id "
        "WHERE i.id IS NULL"
    ).fetchone()[0]
    n_emb = conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    conn.close()
    assert orphans == 0 and n_emb == 20

    # the matrix cache must fully rebuild (id churn defeats append-only) and
    # serve the NEW vector
    ids, mat = eng.index.cache.load()
    assert len(ids) == 20
    conn = sqlite3.connect(eng.db_path)
    new_id = conn.execute(
        "SELECT id FROM images WHERE file_path = ?", (str(target),)
    ).fetchone()[0]
    conn.close()
    row = np.where(ids == new_id)[0]
    assert len(row) == 1
    np.testing.assert_allclose(np.asarray(mat[row[0]]), b, rtol=1e-6)


def test_cache_detects_crash_torn_append(tree, tmp_path):
    """Data files LONGER than the manifest (a crash between the tail append
    and the manifest write) must force a full rebuild — appending onto them
    would permanently scramble the id<->vector pairing and the next
    manifest would mask it forever."""
    eng = ImageDatabase(
        db_path=str(tmp_path / "c.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(tree / "folder0"), inference_batch_size=4)
    cache = eng.index.cache
    ids0, mat0 = cache.load()
    want = {int(i): np.array(mat0[j]) for j, i in enumerate(ids0)}
    dim = mat0.shape[1]

    # Simulate the torn state: files carry extra rows the manifest ignores.
    with open(cache.cache_dir / "vectors.f32", "ab") as f:
        f.write(np.full((3, dim), 7.0, np.float32).tobytes())
    with open(cache.cache_dir / "ids.i64", "ab") as f:
        f.write(np.array([901, 902, 903], np.int64).tobytes())

    # New rows commit; the refresh must NOT append onto the torn files.
    eng.scan_directory(str(tree / "folder1"), inference_batch_size=4)
    ids1, mat1 = cache.load()
    assert len(ids1) > len(ids0)
    assert 901 not in set(int(i) for i in ids1)  # garbage rows gone
    for j, i in enumerate(ids1):
        if int(i) in want:  # original rows still map to their vectors
            np.testing.assert_allclose(np.asarray(mat1[j]), want[int(i)], rtol=1e-6)
    # and the files now match the manifest exactly
    m = cache._read_manifest()
    assert cache._files_match(m)
