"""Safetensors writer: 0-d leaves must survive a round trip (r4 regression:
np.ascontiguousarray silently promoted 0-d to (1,), corrupting logit_bias
through tpuclip-native save/load — found by `tpuclip selftest`)."""

import numpy as np

from tpuclip.models.checkpoint import write_safetensors
from tpuclip.models.convert import read_safetensors


def test_zero_d_and_noncontiguous_round_trip(tmp_path):
    src = {
        "scalar": np.float32(3.5),
        "zero_d": np.asarray(2.25, np.float32),
        "vec": np.arange(6, dtype=np.float32),
        "noncontig": np.arange(12, dtype=np.float32).reshape(3, 4).T,
    }
    p = str(tmp_path / "scalars.safetensors")
    write_safetensors(p, src)
    out = read_safetensors(p)
    assert out["scalar"].shape == ()
    assert out["zero_d"].shape == () and out["zero_d"] == 2.25
    assert out["noncontig"].shape == (4, 3)
    np.testing.assert_array_equal(out["noncontig"], src["noncontig"])
    np.testing.assert_array_equal(out["vec"], src["vec"])
