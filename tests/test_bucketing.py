"""Batch-size ladder (tpuclip/utils/bucketing.py): the compiled-program
matrix for serving is bounded by bucketing request batches to {1,4,16,64}
(r5 serve-load finding: power-of-two bucketing + per-Q batch search
compiled an unbounded matrix of programs, each a multi-second remote
compile landing inside live windows)."""

import numpy as np

from tpuclip.utils.bucketing import BATCH_BUCKETS, batch_bucket


def test_ladder_values():
    assert [batch_bucket(n) for n in (1, 2, 3, 4, 5, 15, 16, 17, 63, 64)] == [
        1, 4, 4, 4, 16, 16, 16, 64, 64, 64
    ]
    # Beyond the ladder: multiples of the max (bounded program count per
    # request cap, not per request size).
    assert batch_bucket(65) == 128
    assert batch_bucket(128) == 128
    assert batch_bucket(129) == 192


def test_ladder_is_monotone_and_covers():
    prev = 0
    for n in range(1, 200):
        b = batch_bucket(n)
        assert b >= n
        assert b >= prev or n <= max(BATCH_BUCKETS)
        prev = b


def test_search_batch_bucketing_results_identical(tmp_path):
    """Padding the query batch to the ladder must not change any result:
    q=3 (pads to 4) and q=5 (pads to 16) return exactly the per-query
    search results."""
    import jax

    from tpuclip.index.search import DeviceIndex
    from tpuclip.index.store import MetadataStore

    rng = np.random.default_rng(3)
    d = 64
    store = MetadataStore(str(tmp_path / "b.db"), embedding_dim=d)
    store.init_schema(verbose=False)
    import sqlite3

    conn = sqlite3.connect(str(tmp_path / "b.db"))
    vecs = rng.standard_normal((300, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    conn.executemany(
        "INSERT INTO images (id, file_path, last_modified) VALUES (?, ?, ?)",
        [(i + 1, f"/x/im{i}.jpg", 0.0) for i in range(300)],
    )
    conn.executemany(
        "INSERT INTO embeddings (image_id, vector) VALUES (?, ?)",
        [(i + 1, vecs[i].tobytes()) for i in range(300)],
    )
    conn.commit()
    conn.close()

    index = DeviceIndex(store, device=jax.devices()[0])
    for q_count in (3, 5):
        qs = rng.standard_normal((q_count, d)).astype(np.float32)
        batched = index.search_batch(qs, 7)
        assert len(batched) == q_count
        singles = [index.search(qs[i], 7) for i in range(q_count)]
        for got, want in zip(batched, singles):
            assert [p for p, _ in got] == [p for p, _ in want]
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want], rtol=1e-5, atol=1e-5
            )
