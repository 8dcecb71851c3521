"""Prefetcher: ordering, fixed shapes, hashing, failure slots, early stop."""

import hashlib
import threading

import numpy as np
import pytest
from PIL import Image

from tpuclip.io.prefetch import prefetch_batches


@pytest.fixture()
def files(tmp_path):
    out = []
    for i in range(10):
        p = tmp_path / f"img_{i}.png"
        Image.new("RGB", (32, 24), (i * 20 % 255, 50, 80)).save(p)
        out.append((str(p), float(i)))
    return out


def test_order_and_shapes(files):
    batches = list(prefetch_batches(iter(files), batch_size=4, image_size=16))
    assert len(batches) == 3  # 4 + 4 + 2
    paths = [item.path for b in batches for item in b.items]
    assert paths == [p for p, _ in files]  # order preserved
    for b in batches:
        assert b.pixels.shape == (4, 16, 16, 3)  # fixed shape incl. tail
        assert b.pixels.dtype == np.uint8
    assert batches[-1].valid.tolist() == [True, True, False, False]
    assert len(batches[-1].items) == 2


def test_hashes_match_hashlib(files):
    batches = list(prefetch_batches(iter(files[:4]), batch_size=4, image_size=16))
    for item in batches[0].items:
        with open(item.path, "rb") as f:
            assert item.file_hash == hashlib.sha256(f.read()).hexdigest()


def test_decode_failures_are_invalid_slots(files, tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    mixed = files[:2] + [(str(bad), 0.0)] + files[2:4]
    (batches,) = [list(prefetch_batches(iter(mixed), batch_size=5, image_size=16))][0:1]
    b = batches[0]
    assert b.valid.tolist() == [True, True, False, True, True]
    assert b.items[2].pixels is None


def test_no_hash_mode(files):
    batches = list(prefetch_batches(iter(files[:2]), batch_size=2, image_size=16, with_hash=False))
    assert all(item.file_hash is None for item in batches[0].items)


def test_stop_event_halts_producer(files):
    stop = threading.Event()
    gen = prefetch_batches(iter(files), batch_size=2, image_size=16, stop_event=stop)
    first = next(gen)
    assert len(first.items) == 2
    stop.set()
    consumed = 1 + sum(1 for _ in gen)
    assert consumed <= len(files) // 2  # producer stopped early


def test_consumer_early_break_does_not_hang(files):
    gen = prefetch_batches(iter(files), batch_size=2, image_size=16)
    next(gen)
    gen.close()  # generator closed mid-stream; producer thread must exit


def test_process_pool_decode_matches_threads(files, tmp_path):
    """TPUCLIP_DECODE_PROCS / num_procs>0 must produce identical batches
    (pixels, hashes, order, failure slots) via spawned worker processes."""
    bad = tmp_path / "bad2.png"
    bad.write_bytes(b"still not an image")
    mixed = files[:3] + [(str(bad), 0.0)] + files[3:6]
    ref = list(prefetch_batches(iter(mixed), batch_size=4, image_size=16))
    got = list(prefetch_batches(iter(mixed), batch_size=4, image_size=16, num_procs=2))
    assert len(got) == len(ref)
    for rb, gb in zip(ref, got):
        np.testing.assert_array_equal(rb.pixels, gb.pixels)
        assert rb.valid.tolist() == gb.valid.tolist()
        assert [i.path for i in rb.items] == [i.path for i in gb.items]
        assert [i.file_hash for i in rb.items] == [i.file_hash for i in gb.items]
