"""`tpuclip check`: cross-table integrity verification and --fix."""

import sqlite3
import sys

import numpy as np
import pytest

from tpuclip.index.store import MetadataStore
from tpuclip.pipelines.check import check_database

DIM = 64


@pytest.fixture()
def db(tmp_path):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((8, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store = MetadataStore(str(tmp_path / "c.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    conn = sqlite3.connect(store.db_path)
    batch = [(f"/data/img{i}.jpg", 1.0, f"h{i}", vecs[i]) for i in range(8)]
    store.commit_with_retry(conn.cursor(), conn, batch, save_full_embeddings=True)
    conn.close()
    return store


def test_clean_db_passes(db):
    res = check_database(db.db_path, verbose=False)
    assert res.ok and res.problems == {}


def test_orphans_detected_and_fixed(db):
    conn = sqlite3.connect(db.db_path)
    # Orphan: embedding rows whose images row is gone (crashed merge shape).
    conn.execute("DELETE FROM images WHERE id = 3")
    conn.commit()
    conn.close()
    res = check_database(db.db_path, verbose=False)
    assert not res.ok
    assert res.problems["orphaned_embeddings"] == 1
    assert res.problems["orphaned_binary_embeddings"] == 1
    res = check_database(db.db_path, fix=True, verbose=False)
    assert res.fixed == 2
    assert check_database(db.db_path, verbose=False).ok


def test_bad_blob_lengths_detected(db):
    conn = sqlite3.connect(db.db_path)
    conn.execute("UPDATE embeddings SET vector = X'DEADBEEF' WHERE image_id = 2")
    conn.execute(
        "UPDATE binary_embeddings SET embedding = X'00' WHERE image_id = 5"
    )
    conn.commit()
    conn.close()
    res = check_database(db.db_path, verbose=False)
    assert res.problems["undecodable_vector_blobs"] == 1
    assert res.problems["bad_binary_blobs"] == 1
    check_database(db.db_path, fix=True, verbose=False)
    after = check_database(db.db_path, verbose=False)
    assert after.ok and after.incomplete_images == 0  # img2 still has binary


def test_nonfinite_vectors_detected(db):
    bad = np.full(DIM, np.nan, np.float32).tobytes()
    conn = sqlite3.connect(db.db_path)
    conn.execute("UPDATE embeddings SET vector = ? WHERE image_id = 4", (bad,))
    conn.commit()
    conn.close()
    res = check_database(db.db_path, verbose=False)
    assert res.problems["nonfinite_or_zero_vectors"] == 1
    check_database(db.db_path, fix=True, verbose=False)
    assert check_database(db.db_path, verbose=False).ok


def test_incomplete_images_informational(db):
    conn = sqlite3.connect(db.db_path)
    conn.execute("DELETE FROM embeddings WHERE image_id = 6")
    conn.execute("DELETE FROM binary_embeddings WHERE image_id = 6")
    conn.commit()
    conn.close()
    res = check_database(db.db_path, verbose=False)
    assert res.ok and res.incomplete_images == 1


def test_check_cli_exit_codes(db, monkeypatch, capsys):
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    from tpuclip.cli import main

    monkeypatch.setattr(sys, "argv", ["tpuclip", "check", "--db", db.db_path])
    main()  # clean: no SystemExit
    assert "Database OK" in capsys.readouterr().out

    conn = sqlite3.connect(db.db_path)
    conn.execute("DELETE FROM images WHERE id = 1")
    conn.commit()
    conn.close()
    with pytest.raises(SystemExit) as e:
        main()
    assert e.value.code == 1
    monkeypatch.setattr(
        sys, "argv", ["tpuclip", "check", "--db", db.db_path, "--fix"]
    )
    main()  # fixed: exit code reflects the now-clean DB
    assert check_database(db.db_path, verbose=False).ok


def test_not_a_database(tmp_path):
    junk = tmp_path / "junk.db"
    junk.write_bytes(b"this is not sqlite" * 100)
    res = check_database(str(junk), verbose=False)
    assert not res.ok
