"""`tpuclip prune`: DB rows for deleted files are removed end to end."""

import sqlite3
import sys

import numpy as np
import pytest

from tpuclip.index.search import DeviceIndex
from tpuclip.index.store import MetadataStore
from tpuclip.pipelines.prune import prune_missing

DIM = 64


def _scanned_db(tmp_path, n=12):
    """A store whose rows point at real files on disk."""
    imgs = tmp_path / "imgs"
    imgs.mkdir(exist_ok=True)
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store = MetadataStore(str(tmp_path / "p.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    conn = sqlite3.connect(store.db_path)
    batch = []
    for i in range(n):
        p = imgs / f"img{i}.jpg"
        p.write_bytes(b"x" * 10)
        batch.append((str(p), 1.0, f"h{i}", vecs[i]))
    store.commit_with_retry(conn.cursor(), conn, batch, save_full_embeddings=True)
    conn.close()
    return store, imgs, vecs


def _counts(store):
    conn = sqlite3.connect(store.db_path)
    try:
        return tuple(
            conn.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
            for t in ("images", "embeddings", "binary_embeddings")
        )
    finally:
        conn.close()


def test_prune_removes_missing_rows(tmp_path):
    store, imgs, _ = _scanned_db(tmp_path)
    for i in (2, 5, 9):
        (imgs / f"img{i}.jpg").unlink()
    res = prune_missing(store.db_path, verbose=False)
    assert (res.checked, res.missing, res.removed) == (12, 3, 3)
    assert _counts(store) == (9, 9, 9)
    # Idempotent: a second run finds nothing.
    res = prune_missing(store.db_path, verbose=False)
    assert res.missing == 0 and _counts(store) == (9, 9, 9)


def test_prune_dry_run_deletes_nothing(tmp_path):
    store, imgs, _ = _scanned_db(tmp_path)
    (imgs / "img0.jpg").unlink()
    res = prune_missing(store.db_path, dry_run=True, verbose=False)
    assert res.missing == 1 and res.removed == 0
    assert _counts(store) == (12, 12, 12)


def test_prune_folder_scope(tmp_path):
    store, imgs, vecs = _scanned_db(tmp_path)
    other = tmp_path / "other"
    other.mkdir()
    gone = other / "gone.jpg"
    gone.write_bytes(b"y")
    conn = sqlite3.connect(store.db_path)
    store.commit_with_retry(
        conn.cursor(), conn, [(str(gone), 1.0, "hg", vecs[0])],
        save_full_embeddings=True,
    )
    conn.close()
    gone.unlink()
    (imgs / "img1.jpg").unlink()
    # Scoped to `other`: img1's missing row is out of scope and survives.
    res = prune_missing(store.db_path, folders=[str(other)], verbose=False)
    assert res.checked == 1 and res.removed == 1
    assert _counts(store) == (12, 12, 12)


def test_search_stops_returning_pruned_rows(tmp_path):
    store, imgs, vecs = _scanned_db(tmp_path)
    index = DeviceIndex(store)
    q = vecs[3]
    results = index.search(q, k=3)
    assert results[0][0].endswith("img3.jpg")
    (imgs / "img3.jpg").unlink()
    prune_missing(store.db_path, verbose=False)
    # fingerprint changed -> matrix rebuilds without the row
    results = index.search(q, k=3)
    assert all(not p.endswith("img3.jpg") for p, _ in results)


def test_prune_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    store, imgs, _ = _scanned_db(tmp_path)
    (imgs / "img4.jpg").unlink()
    from tpuclip.cli import main

    monkeypatch.setattr(
        sys, "argv", ["tpuclip", "prune", "--db", store.db_path, "--dry-run"]
    )
    main()
    out = capsys.readouterr().out
    assert "1 files no longer exist" in out and "img4.jpg" in out
    assert _counts(store) == (12, 12, 12)
    monkeypatch.setattr(sys, "argv", ["tpuclip", "prune", "--db", store.db_path])
    main()
    assert _counts(store) == (11, 11, 11)
