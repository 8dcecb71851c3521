"""`tpuclip export`: embeddings out to npz / npy / jsonl."""

import json
import sqlite3

import numpy as np
import pytest

from tpuclip.index.store import MetadataStore, connect
from tpuclip.pipelines.export import export_embeddings

DIM = 16


@pytest.fixture()
def db(tmp_path):
    store = MetadataStore(str(tmp_path / "e.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((7, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    conn = connect(store.db_path)
    cur = conn.cursor()
    batch = [(f"/lib/img_{i}.jpg", float(i), f"h{i}", vecs[i]) for i in range(7)]
    store.commit_with_retry(cur, conn, batch, save_full_embeddings=True)
    conn.close()
    return store.db_path, vecs


def test_export_npz_roundtrip(tmp_path, db):
    db_path, vecs = db
    out = tmp_path / "dump.npz"
    n = export_embeddings(db_path, str(out), fmt="npz", include_binary=True)
    assert n == 7
    z = np.load(out, allow_pickle=False)
    np.testing.assert_allclose(z["vectors"], vecs, atol=1e-7)
    assert list(z["file_paths"]) == [f"/lib/img_{i}.jpg" for i in range(7)]
    assert z["image_ids"].dtype == np.int64
    np.testing.assert_array_equal(z["binary"], (vecs >= 0).astype(np.uint8))


def test_export_npy_sidecars(tmp_path, db):
    db_path, vecs = db
    out = tmp_path / "mat.npy"
    export_embeddings(db_path, str(out), fmt="npy")
    np.testing.assert_allclose(np.load(out), vecs, atol=1e-7)
    ids = np.load(tmp_path / "mat.ids.npy")
    assert len(ids) == 7
    paths = (tmp_path / "mat.paths.txt").read_text().splitlines()
    assert paths[0] == "/lib/img_0.jpg"


def test_export_jsonl(tmp_path, db):
    db_path, vecs = db
    out = tmp_path / "dump.jsonl"
    export_embeddings(db_path, str(out), fmt="jsonl")
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(lines) == 7
    assert lines[3]["file_path"] == "/lib/img_3.jpg"
    np.testing.assert_allclose(lines[3]["vector"], vecs[3], atol=1e-6)


def test_export_detects_dim_for_int8_db(tmp_path):
    """Without an explicit dim, export must infer the DB's dim (here 16, not
    the 1152 default) from a binary row so int8 blobs decode correctly."""
    store = MetadataStore(
        str(tmp_path / "q.db"), embedding_dim=DIM, vector_dtype="int8"
    )
    store.init_schema(verbose=False)
    vec = np.linspace(-1, 1, DIM).astype(np.float32)
    conn = connect(store.db_path)
    cur = conn.cursor()
    store.commit_with_retry(
        cur, conn, [("/a.jpg", 0.0, "h", vec)], save_full_embeddings=True
    )
    conn.close()
    out = tmp_path / "q.npz"
    export_embeddings(str(store.db_path), str(out))
    z = np.load(out, allow_pickle=False)
    assert z["vectors"].shape == (1, DIM)
    step = np.abs(vec).max() / 127.0
    assert np.abs(z["vectors"][0] - vec).max() <= step * 0.5 + 1e-7


def test_export_empty_db(tmp_path):
    store = MetadataStore(str(tmp_path / "empty.db"), embedding_dim=DIM)
    store.init_schema(verbose=False)
    out = tmp_path / "empty.npz"
    n = export_embeddings(str(store.db_path), str(out))
    assert n == 0
    z = np.load(out, allow_pickle=False)
    assert z["vectors"].shape[0] == 0


def test_export_cli(tmp_path, db, monkeypatch, capsys):
    db_path, _ = db
    from tpuclip.cli import main

    out = tmp_path / "cli_dump.npz"
    main(["export", str(out), "--db", db_path])
    assert out.exists()
    assert np.load(out)["vectors"].shape == (7, DIM)

    with pytest.raises(SystemExit):
        main(["export", str(tmp_path / "x.npz"), "--db", str(tmp_path / "nope.db")])
