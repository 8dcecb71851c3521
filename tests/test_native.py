"""Native C++ library tests: build, correctness vs Python/PIL oracles."""

import hashlib

import numpy as np
import pytest

from tpuclip import native
from tpuclip.ops.hamming import hamming_distance_packed, pack_bits


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_sha256_bytes_matches_hashlib(have_native):
    for payload in (b"", b"abc", b"x" * 100_000, bytes(range(256)) * 999):
        assert native.sha256_bytes(payload) == hashlib.sha256(payload).hexdigest()


def test_sha256_file_matches_hashlib(have_native, tmp_path):
    p = tmp_path / "blob.bin"
    data = np.random.default_rng(0).integers(0, 256, 3_000_000, dtype=np.uint8).tobytes()
    p.write_bytes(data)
    assert native.sha256_file(str(p)) == hashlib.sha256(data).hexdigest()


def test_sha256_file_missing(have_native, tmp_path):
    # falls back to hashlib which raises FileNotFoundError
    with pytest.raises(FileNotFoundError):
        native.sha256_file(str(tmp_path / "nope.bin"))


def test_hamming_rows(have_native):
    rng = np.random.default_rng(1)
    bits_a = rng.integers(0, 2, (20, 1152), dtype=np.uint8)
    bits_b = rng.integers(0, 2, (20, 1152), dtype=np.uint8)
    pa, pb = pack_bits(bits_a), pack_bits(bits_b)
    got = native.hamming_rows(pa, pb)
    want = hamming_distance_packed(pa, pb)
    np.testing.assert_array_equal(got, want)


def test_binary_scan_matches_numpy(have_native):
    rng = np.random.default_rng(2)
    q = rng.integers(0, 2, 1152, dtype=np.uint8)
    m = rng.integers(0, 2, (5000, 1152), dtype=np.uint8)
    got = native.binary_scan(pack_bits(q[None])[0], pack_bits(m))
    want = (m @ q.astype(np.int32)).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_dedup_champions_semantics(have_native):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2, (3, 1152), dtype=np.uint8)
    rows = np.stack([
        base[0],                 # 0: cluster A champion (sim .9)
        base[1],                 # 1: cluster B
        base[0] ^ _flip(1152, 1),  # 2: 1 bit from A → joins A, lower sim
        base[0] ^ _flip(1152, 2),  # 3: 2 bits from A → joins A, higher sim → champion
        base[2],                 # 4: cluster C
    ])
    sims = np.array([0.9, 0.8, 0.5, 0.95, 0.7], np.float32)
    champ = native.dedup_champions(pack_bits(rows), sims, tolerance_bits=2)
    assert champ[0] == champ[2] == champ[3] == 3  # row 3 won cluster A
    assert champ[1] == 1 and champ[4] == 4
    # python fallback must agree
    import os
    os.environ["TPUCLIP_NO_NATIVE"] = "1"
    try:
        import importlib
        native2 = importlib.reload(native)
        champ2 = native2.dedup_champions(pack_bits(rows), sims, tolerance_bits=2)
        np.testing.assert_array_equal(champ, champ2)
    finally:
        del os.environ["TPUCLIP_NO_NATIVE"]
        importlib.reload(native)


def _flip(dim, nbits):
    v = np.zeros(dim, np.uint8)
    v[:nbits] = 1
    return v


@pytest.mark.parametrize("h,w", [(97, 203), (224, 224), (30, 40), (500, 80)])
def test_resize_bicubic_close_to_pil(have_native, h, w):
    from PIL import Image

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ours = native.resize_bicubic(img, 64)
    pil = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.Resampling.BICUBIC), np.uint8
    )
    diff = np.abs(ours.astype(int) - pil.astype(int))
    # PIL uses int16 fixed-point coefficients; float accumulation may differ
    # by ±1 LSB on a fraction of pixels — far below the preprocessing noise
    # floor (bf16 towers, JPEG decode variation).
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_resize_batch(have_native):
    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for h, w in [(50, 70), (224, 224), (31, 500)]
    ]
    batch = native.resize_batch(imgs, 56)
    assert batch.shape == (3, 56, 56, 3)
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(batch[i], native.resize_bicubic(img, 56))
