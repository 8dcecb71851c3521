"""Error-containment tests: corrupt inputs and DB lock contention
(image_database.py:985-997, :1084-1096 semantics)."""

import sqlite3
import threading
import time

import numpy as np
import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase
from tpuclip.index.store import MetadataStore, connect


def test_corrupt_files_are_contained(tmp_path):
    """Undecodable files count as errors; the scan finishes and indexes the
    good files."""
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.new("RGB", (40, 40), (200, 0, 0)).save(imgs / "good1.jpg")
    Image.new("RGB", (40, 40), (0, 200, 0)).save(imgs / "good2.png")
    (imgs / "corrupt.jpg").write_bytes(b"\xff\xd8\xff\xe0 not really a jpeg")
    (imgs / "empty.png").touch()
    eng = ImageDatabase(
        db_path=str(tmp_path / "c.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(imgs), inference_batch_size=4)
    assert eng.store.count_images() == 2
    results = eng.search("red", k=2, show_duplicates=True)
    assert len(results) == 2


def test_truncated_image_contained(tmp_path):
    """A file that decodes headers but truncates mid-stream must not crash."""
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.new("RGB", (40, 40), (0, 0, 200)).save(imgs / "ok.png")
    full = imgs / "full.jpg"
    Image.new("RGB", (400, 400), (120, 90, 30)).save(full, quality=90)
    data = full.read_bytes()
    (imgs / "trunc.jpg").write_bytes(data[: len(data) // 3])
    full.unlink()
    eng = ImageDatabase(
        db_path=str(tmp_path / "t.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(imgs), inference_batch_size=4)
    # truncated JPEG may decode partially (PIL tolerance) or fail; either way
    # the scan completes and the good image is present
    assert 1 <= eng.store.count_images() <= 2


def test_commit_retry_on_locked_db(tmp_path):
    """A concurrent writer holding the DB must trigger the retry loop, and
    the commit must succeed once the lock clears."""
    db_path = str(tmp_path / "lock.db")
    store = MetadataStore(db_path, embedding_dim=8)
    store.init_schema(verbose=False)

    # Writer thread grabs an EXCLUSIVE lock for a moment
    locked = threading.Event()
    release = threading.Event()

    def hold_lock():
        conn = sqlite3.connect(db_path, timeout=30.0)
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("BEGIN EXCLUSIVE")
        locked.set()
        release.wait(timeout=10)
        conn.commit()
        conn.close()

    t = threading.Thread(target=hold_lock)
    t.start()
    locked.wait(timeout=10)

    def release_soon():
        time.sleep(0.25)
        release.set()

    threading.Thread(target=release_soon).start()

    conn = sqlite3.connect(db_path, timeout=0.05)  # force fast lock errors
    conn.execute("PRAGMA busy_timeout=10")
    cur = conn.cursor()
    vec = np.ones(8, np.float32)
    store.commit_with_retry(
        cur, conn, [("/x/a.jpg", 1.0, "h", vec)], save_full_embeddings=True
    )
    conn.close()
    t.join(timeout=10)
    assert store.count_images() == 1


def test_batch_embed_failed_slots_map_to_none(tmp_path):
    """_get_image_embeddings_batch: failed loads return None in-place
    (image_database.py:496-504)."""
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.new("RGB", (40, 40), (1, 2, 3)).save(imgs / "a.png")
    eng = ImageDatabase(
        db_path=str(tmp_path / "n.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    out = eng._get_image_embeddings_batch(
        [str(imgs / "a.png"), str(imgs / "missing.png"), str(imgs / "a.png")]
    )
    assert out[1] is None
    assert out[0] is not None and out[2] is not None
    np.testing.assert_allclose(out[0], out[2])


def test_dim_mismatch_warns_at_init(tmp_path, monkeypatch, capsys):
    """Opening a DB scanned at one dim with a different-dim model must warn
    loudly at init instead of failing silently at query time."""
    import sqlite3

    import numpy as np

    from tpuclip.engine import ImageDatabase
    from tpuclip.index.store import MetadataStore, connect

    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    store = MetadataStore(str(tmp_path / "d.db"), embedding_dim=128)
    store.init_schema(verbose=False)
    conn = connect(store.db_path)
    store.commit_with_retry(
        conn.cursor(), conn,
        [("/a.jpg", 0.0, "h", np.ones(128, np.float32))],
        save_full_embeddings=True,
    )
    conn.close()
    ImageDatabase(
        db_path=store.db_path,
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",  # 64-d
    )
    out = capsys.readouterr().out
    assert "built with 128-d embeddings" in out
