"""Whole-DB duplicate clustering: banding correctness vs brute force."""

import sqlite3

import numpy as np
import pytest

from tpuclip.index.store import MetadataStore
from tpuclip.ops.hamming import hamming_distance_packed, pack_bits
from tpuclip.pipelines.duplicates import find_duplicate_clusters


def _store_with_vectors(tmp_path, vecs):
    store = MetadataStore(str(tmp_path / "d.db"), embedding_dim=vecs.shape[1])
    store.init_schema(verbose=False)
    conn = sqlite3.connect(store.db_path)
    cur = conn.cursor()
    store.commit_with_retry(
        cur, conn,
        [(f"/d/{i}.jpg", float(i), "h", vecs[i]) for i in range(len(vecs))],
        save_full_embeddings=False,
    )
    conn.close()
    return store


def _brute_force_clusters(vecs, tol):
    bits = (vecs >= 0).astype(np.uint8)
    packed = pack_bits(bits)
    n = len(vecs)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if hamming_distance_packed(packed[i], packed[j]) <= tol:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return sorted(
        (sorted(v) for v in groups.values() if len(v) >= 2), key=len, reverse=True
    )


@pytest.mark.parametrize("tol", [0, 2, 5])
def test_banding_matches_brute_force(tmp_path, tol):
    rng = np.random.default_rng(0)
    d = 256
    base = rng.standard_normal((10, d)).astype(np.float32)
    rows = [base[i] for i in range(10)]
    # craft near-duplicates: flip signs of a few coordinates
    for i, flips in [(0, 1), (0, 2), (1, 4), (2, 0), (3, tol + 3)]:
        v = base[i].copy()
        idx = rng.choice(d, size=flips, replace=False) if flips else []
        v[idx] = -v[idx]
        rows.append(v)
    vecs = np.stack(rows)
    store = _store_with_vectors(tmp_path / f"t{tol}", vecs)

    got = find_duplicate_clusters(store, tolerance_bits=tol)
    got_idx = sorted(
        (sorted(i - 1 for i, _ in cluster) for cluster in got), key=len, reverse=True
    )  # image_ids are 1-based insert order
    want = _brute_force_clusters(vecs, tol)
    assert got_idx == want


def test_duplicates_cli(tmp_path, capsys, monkeypatch):
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    rng = np.random.default_rng(1)
    v = rng.standard_normal((1, 128)).astype(np.float32)
    vecs = np.concatenate([v, v, rng.standard_normal((3, 128)).astype(np.float32)])
    store = _store_with_vectors(tmp_path, vecs)

    from tpuclip.cli import main

    main(["duplicates", "--db", store.db_path, "--tolerance", "2"])
    out = capsys.readouterr().out
    assert "Found 1 duplicate cluster(s) covering 2 images" in out
    assert "/d/0.jpg" in out and "/d/1.jpg" in out
    assert "1 image(s) could be removed" in out
