"""Test environment: force CPU with a virtual 8-device mesh.

Multi-chip logic (sharded search, DP inference, training step) runs in CI on
``xla_force_host_platform_device_count=8`` CPU devices — the idiomatic JAX
substitute for a fake backend (SURVEY.md §4.5). Must be set before jax import.
"""

import os

# TPUCLIP_TEST_TPU=1 runs the suite on the real device backend instead of the
# virtual 8-CPU mesh (multi-device tests then skip; see mesh8 fixture).
_USE_REAL_DEVICE = os.environ.get("TPUCLIP_TEST_TPU") == "1"

if not _USE_REAL_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TPUCLIP_QUIET", "1")
os.environ.setdefault("TPUCLIP_INIT", "random")

# The harness environment force-selects an experimental TPU platform plugin
# via JAX_PLATFORMS=axon from a sitecustomize hook; the env var alone is not
# enough, so pin the platform through jax.config too (before any devices are
# instantiated).
import jax  # noqa: E402

if not _USE_REAL_DEVICE:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_home(tmp_path, monkeypatch):
    """Point all default output paths at a temp dir."""
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path))
    return tmp_path


import pytest as _pytest  # noqa: E402

# Strict fp32-oracle tests assume CPU matmul arithmetic; on real devices the
# default-precision f32 matmuls flip near-ties. Compiled-kernel correctness
# on hardware is validated separately by scripts/tpu_validate.py.
cpu_only = _pytest.mark.skipif(
    _USE_REAL_DEVICE, reason="fp32-exact oracle test (see scripts/tpu_validate.py for on-device validation)"
)

# True when the suite runs on the real device backend (TPUCLIP_TEST_TPU=1).
ON_DEVICE = _USE_REAL_DEVICE


def assert_topk_oracle(got_idx, want_idx, got_scores=None, want_scores=None,
                       recall_device=0.9, rtol_device=2e-2, atol_device=2e-2):
    """Dtype-aware top-k oracle assertion (VERDICT r2 item 8).

    On CPU: bit-exact index equality + tight score tolerance (fp32 matmuls
    are IEEE there). On the real device backend: TPU f32 matmuls use reduced
    internal precision, so near-tie ranks legitimately flip — assert set
    recall and loose score closeness instead of skipping entirely, keeping
    the kernel logic exercised on hardware for every shape the CPU suite
    covers. Exactness-on-hardware is separately pinned by
    scripts/tpu_validate.py against fp64 oracles.
    """
    import numpy as np

    got_idx = np.asarray(got_idx)
    want_idx = np.asarray(want_idx)
    if not ON_DEVICE:
        np.testing.assert_array_equal(got_idx, want_idx)
        if got_scores is not None:
            np.testing.assert_allclose(
                np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-5
            )
        return
    g2, w2 = np.atleast_2d(got_idx), np.atleast_2d(want_idx)
    recalls = [
        len(set(g2[r].tolist()) & set(w2[r].tolist())) / max(1, w2.shape[1])
        for r in range(w2.shape[0])
    ]
    assert float(np.mean(recalls)) >= recall_device, (
        f"device top-k recall {np.mean(recalls):.3f} < {recall_device}"
    )
    if got_scores is not None:
        gs = np.sort(np.atleast_2d(np.asarray(got_scores)), axis=-1)
        ws = np.sort(np.atleast_2d(np.asarray(want_scores)), axis=-1)
        np.testing.assert_allclose(gs, ws, rtol=rtol_device, atol=atol_device)


def parity_cos_bound() -> float:
    """Minimum acceptable cosine vs the torch-CPU oracle: near-exact on CPU,
    the BASELINE.json >=0.999 north star when the towers run on device."""
    return 0.999 if ON_DEVICE else 0.9999
