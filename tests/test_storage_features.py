"""fp16 vector blobs and thumbnail GC (ROADMAP storage items, VERDICT r1 #9)."""

import sqlite3

import numpy as np
import pytest

from tpuclip.index.search import DeviceIndex
from tpuclip.index.store import MetadataStore
from tpuclip.io.thumbnails import Thumbnailer, referenced_hashes_for_dbs

DIM = 64


def _commit(store, vecs, prefix="/data"):
    conn = sqlite3.connect(store.db_path)
    cur = conn.cursor()
    batch = [
        (f"{prefix}/img{i}.jpg", 1.0 * i, f"hash{i}", vecs[i]) for i in range(len(vecs))
    ]
    store.commit_with_retry(cur, conn, batch, save_full_embeddings=True)
    conn.close()


@pytest.fixture()
def vecs():
    rng = np.random.default_rng(3)
    v = rng.standard_normal((120, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_fp16_blobs_halve_storage_and_roundtrip(tmp_path, vecs):
    s32 = MetadataStore(str(tmp_path / "f32.db"), embedding_dim=DIM)
    s32.init_schema(verbose=False)
    _commit(s32, vecs)
    s16 = MetadataStore(str(tmp_path / "f16.db"), embedding_dim=DIM, vector_dtype="fp16")
    s16.init_schema(verbose=False)
    _commit(s16, vecs)

    blob32 = sqlite3.connect(s32.db_path).execute("SELECT vector FROM embeddings LIMIT 1").fetchone()[0]
    blob16 = sqlite3.connect(s16.db_path).execute("SELECT vector FROM embeddings LIMIT 1").fetchone()[0]
    assert len(blob32) == DIM * 4 and len(blob16) == DIM * 2

    for ids, out in s16.iter_embeddings():
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, vecs[ids - 1], atol=2e-3)


def test_fp16_search_matches_fp32_ordering(tmp_path, vecs):
    rng = np.random.default_rng(4)
    s32 = MetadataStore(str(tmp_path / "a.db"), embedding_dim=DIM)
    s32.init_schema(verbose=False)
    _commit(s32, vecs)
    s16 = MetadataStore(str(tmp_path / "b.db"), embedding_dim=DIM, vector_dtype="fp16")
    s16.init_schema(verbose=False)
    _commit(s16, vecs)
    q = rng.standard_normal(DIM).astype(np.float32)
    r32 = DeviceIndex(s32).search(q, 10)
    r16 = DeviceIndex(s16).search(q, 10)
    assert [p for p, _ in r16] == [p for p, _ in r32]
    # fp16 rounding keeps scores within half-precision tolerance
    np.testing.assert_allclose([s for _, s in r16], [s for _, s in r32], atol=2e-3)


def test_mixed_dtype_db_reads_back(tmp_path, vecs):
    """A DB scanned partly in fp32 and partly in fp16 (resumed with a
    different setting) must still read every row."""
    store = MetadataStore(str(tmp_path / "m.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    _commit(store, vecs[:60], prefix="/a")
    store.vector_dtype = "fp16"
    _commit(store, vecs[60:], prefix="/b")
    got = np.concatenate([v for _, v in store.iter_embeddings()])
    assert got.shape == (120, DIM)
    np.testing.assert_allclose(got, vecs, atol=2e-3)


def test_thumbnail_gc(tmp_path, vecs):
    store = MetadataStore(str(tmp_path / "g.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    _commit(store, vecs[:5])

    tdir = tmp_path / "thumbs"
    tdir.mkdir()
    referenced = referenced_hashes_for_dbs([store.db_path])
    assert referenced == {f"hash{i}" for i in range(5)}
    for h in ["hash0", "hash1", "orphan_a", "orphan_b"]:
        (tdir / f"{h}.jpg").write_bytes(b"x" * 100)
    (tdir / "notathumb.png").write_bytes(b"y")  # non-jpg is left alone

    t = Thumbnailer(str(tdir))
    removed, reclaimed = t.gc_orphans(referenced, dry_run=True)
    assert (removed, reclaimed) == (2, 200)
    assert (tdir / "orphan_a.jpg").exists()  # dry-run deletes nothing

    removed, reclaimed = t.gc_orphans(referenced)
    assert (removed, reclaimed) == (2, 200)
    assert not (tdir / "orphan_a.jpg").exists()
    assert (tdir / "hash0.jpg").exists() and (tdir / "notathumb.png").exists()


def test_gc_cli(tmp_path, vecs, monkeypatch, capsys):
    import os

    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path))
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    from tpuclip.cli import main as cli_main
    from tpuclip.config import default_paths

    paths = default_paths()
    os.makedirs(paths.db_dir, exist_ok=True)
    store = MetadataStore(os.path.join(paths.db_dir, "x.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    _commit(store, vecs[:3])
    os.makedirs(paths.thumbnails_dir, exist_ok=True)
    for h in ["hash0", "gone"]:
        with open(os.path.join(paths.thumbnails_dir, f"{h}.jpg"), "wb") as f:
            f.write(b"z" * 50)
    cli_main(["gc"])
    out = capsys.readouterr().out
    assert "Removed 1" in out
    assert not os.path.exists(os.path.join(paths.thumbnails_dir, "gone.jpg"))
    assert os.path.exists(os.path.join(paths.thumbnails_dir, "hash0.jpg"))
