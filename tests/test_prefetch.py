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


def test_worker_process_crash_is_contained(files, tmp_path, monkeypatch):
    """A decode worker PROCESS dying mid-batch (simulating a codec segfault;
    here os.abort in the worker) must map the batch's poisoned slots to
    contained decode failures, rebuild the pool, and keep scanning — a bad
    file must never kill a scan (tpuclip/io/prefetch.py flush containment)."""
    import os as _os

    import tpuclip.io.prefetch as pf

    crash = tmp_path / "crash.png"
    Image.new("RGB", (32, 24), (1, 2, 3)).save(crash)
    # The crash file goes LAST in the first batch: the single FIFO worker
    # finishes the three good slots before aborting, so exactly one slot
    # is poisoned and the assertion below is deterministic.
    mixed = files[:3] + [(str(crash), 0.0)] + files[3:6]

    real_make = pf._make_decode_executor
    made = []

    class _Rigged:
        """Pass-through executor that swaps the crash file's decode for
        os.abort — SIGABRT inside the spawned worker, the same failure
        shape as a native codec segfault."""

        def __init__(self, real):
            self._real = real

        def submit(self, fn, path, *a, **k):
            if _os.path.basename(str(path)) == "crash.png":
                return self._real.submit(_os.abort)
            return self._real.submit(fn, path, *a, **k)

        def shutdown(self, wait=True):
            self._real.shutdown(wait=wait)

    def make(num_workers, num_procs):
        pool = real_make(num_workers, num_procs)
        made.append(pool)
        return _Rigged(pool) if len(made) == 1 else pool

    monkeypatch.setattr(pf, "_make_decode_executor", make)
    batches = list(
        prefetch_batches(iter(mixed), batch_size=4, image_size=16, num_procs=1)
    )
    assert len(made) >= 2  # the broken pool was rebuilt
    paths = [item.path for b in batches for item in b.items]
    assert paths == [p for p, _ in mixed]  # nothing dropped, order kept
    flat_valid = [bool(v) for b in batches for v in b.valid[: len(b.items)]]
    # Exactly the crash.png slot is poisoned. Deliberately NOT asserting
    # that all three pre-crash slots survived: whether the pool's manager
    # thread drains queued good results from the result pipe before
    # declaring the pool broken after os.abort is a CPython-internals
    # ordering detail, not a contract (advisor r3). The containment
    # contract is: the crash slot is invalid, no OTHER batch loses slots,
    # and nothing is dropped or reordered (asserted above).
    assert not flat_valid[3]
    assert all(flat_valid[4:])  # post-rebuild batches are fully valid
    assert batches[0].items[3].pixels is None


def test_fast_decode_levels(tmp_path, monkeypatch):
    """Level parsing + the draft targets each level hands libjpeg.

    Level 1 drafts at image_size (never upsamples); level 2 drafts at
    image_size//2 (the final resize may upsample <=2x). Both must still
    produce fixed-shape uint8 batches with hashes intact."""
    from tpuclip.io.prefetch import _fast_decode_level

    for raw, want in [("", 0), ("0", 0), ("1", 1), ("true", 1), ("yes", 1), ("2", 2)]:
        monkeypatch.setenv("TPUCLIP_FAST_DECODE", raw)
        assert _fast_decode_level() == want, raw

    p = tmp_path / "photo.jpg"
    rng = np.random.default_rng(3)
    low = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    arr = np.asarray(Image.fromarray(low).resize((1024, 768), Image.BILINEAR))
    Image.fromarray(arr).save(p, "JPEG", quality=85)

    outs = {}
    for level in ("0", "1", "2"):
        monkeypatch.setenv("TPUCLIP_FAST_DECODE", level)
        (b,) = list(prefetch_batches(iter([(str(p), 0.0)]), batch_size=1, image_size=224))
        assert b.pixels.shape == (1, 224, 224, 3) and b.pixels.dtype == np.uint8
        assert b.valid.tolist() == [True] and b.items[0].file_hash
        outs[level] = b.pixels[0].astype(np.int16)

    # level 1 stays close to the exact decode; level 2 is coarser but bounded
    d1 = np.abs(outs["1"] - outs["0"]).mean()
    d2 = np.abs(outs["2"] - outs["0"]).mean()
    assert d1 < 3.0
    assert d1 < d2 < 10.0


def test_decode_modes_normalize_to_rgb(tmp_path):
    """Palette/grayscale sources resize to the same pixels as an explicit
    RGB convert (the decode layer no longer force-copies RGB frames)."""
    from tpuclip.io.decode import load_image
    from tpuclip.io.preprocess import resize_to_uint8

    rng = np.random.default_rng(5)
    base = Image.fromarray(rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8))
    cases = {
        "rgb.jpg": base,
        "gray.png": base.convert("L"),
        "palette.gif": base.convert("P"),
        "rgba.png": base.convert("RGBA"),
    }
    for name, img in cases.items():
        p = tmp_path / name
        img.save(p)
        loaded = load_image(str(p))
        assert loaded is not None
        want = np.asarray(
            resize_to_uint8(Image.open(p).convert("RGB"), 16), dtype=np.uint8
        )
        got = resize_to_uint8(loaded, 16)
        np.testing.assert_array_equal(got, want)


def test_malformed_env_knobs_fall_back(monkeypatch, capsys):
    """Malformed TPUCLIP_DECODE_WORKERS/PROCS values must warn and fall
    back to defaults instead of raising inside the producer thread."""
    from tpuclip.io.prefetch import default_procs, default_workers

    monkeypatch.setenv("TPUCLIP_QUIET", "0")  # conftest silences log()
    monkeypatch.setenv("TPUCLIP_DECODE_WORKERS", "many")
    monkeypatch.setenv("TPUCLIP_DECODE_PROCS", "3.5")
    assert default_workers() >= 1
    assert default_procs() == 0
    out = capsys.readouterr().out
    assert "TPUCLIP_DECODE_WORKERS" in out and "TPUCLIP_DECODE_PROCS" in out
    monkeypatch.setenv("TPUCLIP_DECODE_WORKERS", "2")
    monkeypatch.setenv("TPUCLIP_DECODE_PROCS", "1")
    assert default_workers() == 2
    assert default_procs() == 1


def test_decode_cache_round_trip(files, tmp_path, monkeypatch):
    """TPUCLIP_DECODE_CACHE: first pass populates content-addressed .npy
    entries; a second pass serves pixels from the cache WITHOUT invoking
    the decoder (proved by bombing the decoder), with identical output.
    Hash/census/dedup work still happens on hits (the hash IS the key)."""
    import os

    import tpuclip.io.prefetch as pf

    cache = tmp_path / "dcache"
    monkeypatch.setenv("TPUCLIP_DECODE_CACHE", str(cache))

    first = list(prefetch_batches(iter(files), batch_size=4, image_size=16))
    entries = sorted(os.listdir(cache))
    assert len(entries) == len(files)
    assert all(e.endswith("_16_l0.npy") for e in entries)

    def bomb(*a, **k):
        raise AssertionError("decoder must not run on a cache hit")

    monkeypatch.setattr(pf, "load_image_bytes", bomb)
    second = list(prefetch_batches(iter(files), batch_size=4, image_size=16))
    for b1, b2 in zip(first, second):
        np.testing.assert_array_equal(b1.pixels, b2.pixels)
        np.testing.assert_array_equal(b1.valid, b2.valid)
        assert [i.file_hash for i in b1.items] == [i.file_hash for i in b2.items]

    # Different settings key differently: a new image_size misses the cache
    # (and with the decoder bombed, comes back as an invalid slot, not as
    # wrong-size pixels silently served).
    third = list(prefetch_batches(iter(files[:4]), batch_size=4, image_size=32))
    assert not third[0].valid.any()


def test_decode_cache_corrupt_entry_falls_through(files, tmp_path, monkeypatch):
    import os

    import tpuclip.io.prefetch as pf

    cache = tmp_path / "dcache"
    monkeypatch.setenv("TPUCLIP_DECODE_CACHE", str(cache))
    list(prefetch_batches(iter(files[:2]), batch_size=2, image_size=16))
    for e in os.listdir(cache):
        with open(cache / e, "wb") as f:
            f.write(b"not an npy file")
    # Corrupt entries must be ignored (real decode again), then rewritten.
    out = list(prefetch_batches(iter(files[:2]), batch_size=2, image_size=16))
    assert out[0].valid.all()
    reread = np.load(cache / sorted(os.listdir(cache))[0])
    assert reread.shape == (16, 16, 3) and reread.dtype == np.uint8


def test_gc_decode_cache_evicts_oldest_and_stale_tmps(tmp_path):
    """Review r4: the decode cache grew without bound. gc_decode_cache
    evicts oldest-mtime entries down to the cap and clears stale .tmp
    publish leftovers; dry-run deletes nothing."""
    import os
    import time as _time

    from tpuclip.io.prefetch import gc_decode_cache

    d = tmp_path / "cache"
    d.mkdir()
    now = _time.time()
    for i in range(5):
        p = d / f"hash{i}_224_l0.npy"
        p.write_bytes(b"x" * 1000)
        os.utime(p, (now - 1000 + i, now - 1000 + i))  # hash0 oldest
    stale = d / "hash9_224_l0.npy.1.2.tmp"
    stale.write_bytes(b"y" * 500)
    os.utime(stale, (now - 7200, now - 7200))
    fresh_tmp = d / "hash8_224_l0.npy.3.4.tmp"
    fresh_tmp.write_bytes(b"z" * 500)

    # Dry run: reports, removes nothing.
    n, freed, kept = gc_decode_cache(str(d), max_bytes=3000, dry_run=True)
    assert n == 3 and freed == 2500 and kept == 3000  # 2 entries + stale tmp
    assert len(list(d.iterdir())) == 7

    n, freed, kept = gc_decode_cache(str(d), max_bytes=3000)
    assert n == 3 and kept == 3000
    remaining = sorted(p.name for p in d.iterdir())
    assert "hash0_224_l0.npy" not in remaining  # oldest evicted first
    assert "hash1_224_l0.npy" not in remaining
    assert stale.name not in remaining          # stale tmp removed
    assert fresh_tmp.name in remaining          # in-flight tmp kept

    # Report-only mode: no cap, nothing removed.
    n, freed, kept = gc_decode_cache(str(d), max_bytes=None)
    assert n == 0 and kept == 3000

    # Missing dir: graceful zeros.
    assert gc_decode_cache(str(tmp_path / "nope"), 1) == (0, 0, 0)
