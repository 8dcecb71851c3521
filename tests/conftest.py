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
