"""Concurrent reads during writes — the reference's WAL story
(image_database.py:253, README.md:136): a search session keeps working while
a scan commits into the same database."""

import threading

import numpy as np
import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase


def test_search_during_scan(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(40):
        Image.new("RGB", (32, 32), (i * 6 % 255, 90, 120)).save(imgs / f"im_{i:03d}.png")

    writer = ImageDatabase(
        db_path=str(tmp_path / "w.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    # seed a few rows so the reader has something before the scan starts
    writer.scan_directory(str(imgs), inference_batch_size=4, limit=8)

    reader = ImageDatabase(
        db_path=str(tmp_path / "w.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )

    errors = []

    def scan_rest():
        try:
            writer.scan_directory(str(imgs), inference_batch_size=4, batch_size=4)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=scan_rest)
    t.start()
    results_seen = []
    try:
        while t.is_alive():
            res = reader.search("a colored square", k=5, show_duplicates=True)
            assert all(np.isfinite(s) for _, s in res)
            results_seen.append(len(res))
    finally:
        t.join(timeout=60)
    assert not errors, errors
    assert writer.store.count_images() == 40
    # reader worked throughout and eventually saw a growing index
    assert results_seen and max(results_seen) == 5
    final = reader.search("a colored square", k=10, show_duplicates=True)
    assert len(final) == 10


_REFRESH_CHILD = """
import os, sys, time
db, go = sys.argv[1], sys.argv[2]
from tpuclip.index.store import MetadataStore
from tpuclip.index.cache import MatrixCache
cache = MatrixCache(MetadataStore(db, embedding_dim=16))
deadline = time.time() + 30
while not os.path.exists(go):
    if time.time() > deadline:
        raise SystemExit("go file never appeared")
    time.sleep(0.002)
appended = cache.refresh()
ids, _ = cache.load(refresh=False)
print(f"{len(ids)} {int(appended)}")
"""


def test_concurrent_process_refresh_appends_once(tmp_path):
    """Two PROCESSES refreshing one stale cache concurrently (serve + CLI
    on one DB) must not interleave their tail appends: the refresh flock +
    freshness re-check under the lock makes one process append and the
    other skip, so the id<->vector pairing stays exact
    (tpuclip/index/cache.py refresh)."""
    import os
    import sqlite3
    import subprocess
    import sys
    from pathlib import Path

    import tpuclip
    from tpuclip.index.cache import MatrixCache
    from tpuclip.index.store import MetadataStore

    dim = 16
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((32, dim)).astype(np.float32)
    db = str(tmp_path / "conc.db")
    store = MetadataStore(db, embedding_dim=dim)
    store.init_schema(verbose=False)

    def commit(rows):
        conn = sqlite3.connect(db)
        batch = [
            (f"/data/img{i}.jpg", 1.0, f"h{i}", vecs[i]) for i in rows
        ]
        store.commit_with_retry(conn.cursor(), conn, batch, save_full_embeddings=True)
        conn.close()

    commit(range(20))
    MatrixCache(store).refresh()  # manifest at 20 rows
    commit(range(20, 32))  # stale tail: the next refresh appends

    repo_root = str(Path(tpuclip.__file__).parents[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    # Explicit, not inherited from conftest's setdefault: with QUIET=0 the
    # 'Matrix cache refreshed' log line would land on the child's stdout
    # and break the exact-output assertion below (advisor r3).
    env["TPUCLIP_QUIET"] = "1"
    go = str(tmp_path / "go")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _REFRESH_CHILD, db, go],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    import time

    time.sleep(0.5)  # let both children reach the go-file poll
    (tmp_path / "go").touch()
    outs = [p.communicate(timeout=120) for p in procs]
    appended_flags = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err
        count, appended = out.split()
        assert count == "32", (out, err)
        appended_flags.append(int(appended))
    # Exactly one child must have written the data files; the other must
    # have skipped via the freshness re-check (pre-lock or under the lock).
    # Asserting this — not just the final state — proves the exclusion path
    # was actually exercised rather than both children racing past it
    # (advisor r3: the go-file barrier makes contention likely, not
    # guaranteed, and a silent double-append could still net count==32
    # only by luck of the fingerprint re-check).
    assert sorted(appended_flags) == [0, 1], appended_flags

    ids, mat = MatrixCache(store).load()
    assert len(ids) == 32  # appended once, not twice
    assert sorted(set(int(i) for i in ids)) == list(range(1, 33))
    for row, image_id in enumerate(ids):
        np.testing.assert_array_equal(np.asarray(mat[row]), vecs[int(image_id) - 1])
