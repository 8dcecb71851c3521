"""Sharded multi-worker indexing + merge: N workers scanning disjoint folder
shards into separate DBs must merge into the same index a single scan builds."""

import sqlite3

import numpy as np
import pytest
from PIL import Image

from tpuclip.cli import main
from tpuclip.engine import ImageDatabase
from tpuclip.pipelines.merge import merge_databases
from tpuclip.pipelines.scan import shard_of_folder


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "imgs"
    rng = np.random.default_rng(0)
    for f in range(6):
        for i in range(3):
            p = root / f"folder{f}" / f"img{i}.png"
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(p)
    return root


def test_shard_assignment_partitions(tree):
    folders = [str(tree / f"folder{f}") for f in range(6)]
    shards = [shard_of_folder(f, 3) for f in folders]
    assert all(0 <= s < 3 for s in shards)
    # deterministic
    assert shards == [shard_of_folder(f, 3) for f in folders]


def test_sharded_scan_and_merge_equals_single_scan(tree, tmp_path):
    def make_engine(name):
        return ImageDatabase(
            db_path=str(tmp_path / name),
            model_cache_dir=str(tmp_path / "models"),
            model_name="tpuclip/test-tiny",
            inference_batch_size=4,
        )

    # reference: one full scan
    full = make_engine("full.db")
    full.scan_directory(str(tree), inference_batch_size=4)
    assert full.store.count_images() == 18

    # 3 shard workers
    shard_dbs = []
    covered = 0
    for s in range(3):
        eng = make_engine(f"shard{s}.db")
        eng.scan_directory(str(tree), inference_batch_size=4, num_shards=3, shard_index=s)
        shard_dbs.append(eng.db_path)
        covered += eng.store.count_images()
    assert covered == 18  # disjoint and complete

    merged_path = str(tmp_path / "merged.db")
    merge_databases(merged_path, shard_dbs)

    conn_a = sqlite3.connect(full.db_path)
    conn_b = sqlite3.connect(merged_path)
    paths_a = sorted(r[0] for r in conn_a.execute("SELECT file_path FROM images"))
    paths_b = sorted(r[0] for r in conn_b.execute("SELECT file_path FROM images"))
    assert paths_a == paths_b
    n_emb = conn_b.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    n_bin = conn_b.execute("SELECT COUNT(*) FROM binary_embeddings").fetchone()[0]
    assert n_emb == 18 and n_bin == 18

    # embeddings byte-identical per path (same model, same preprocessing)
    q = """SELECT i.file_path, e.vector FROM embeddings e JOIN images i ON e.image_id=i.id"""
    vecs_a = dict(conn_a.execute(q).fetchall())
    vecs_b = dict(conn_b.execute(q).fetchall())
    conn_a.close()
    conn_b.close()
    assert all(vecs_a[p] == vecs_b[p] for p in vecs_a)

    # re-merge is idempotent
    merge_databases(merged_path, shard_dbs)
    conn = sqlite3.connect(merged_path)
    assert conn.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 18
    conn.close()

    # merged DB is searchable
    merged_eng = ImageDatabase(
        db_path=merged_path,
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
    )
    results = merged_eng.search("anything", k=5, show_duplicates=True)
    assert len(results) == 5


def test_merge_cli(tree, tmp_path, monkeypatch):
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("TPUCLIP_MODEL", "tpuclip/test-tiny")
    main(["scan", str(tree), "--db", str(tmp_path / "a.db"), "--inference-batch-size", "4",
          "--num-shards", "2", "--shard-index", "0"])
    main(["scan", str(tree), "--db", str(tmp_path / "b.db"), "--inference-batch-size", "4",
          "--num-shards", "2", "--shard-index", "1"])
    main(["merge", str(tmp_path / "m.db"), str(tmp_path / "a.db"), str(tmp_path / "b.db")])
    conn = sqlite3.connect(tmp_path / "m.db")
    assert conn.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 18
    conn.close()
