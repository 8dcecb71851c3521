"""The driver-facing entry points must work in a FRESH process with no env
setup — round 1 shipped a dryrun that asserted on real device count and died
on the 1-chip bench host (MULTICHIP_r01.json ok=false). These tests invoke the
real entry points in clean subprocesses, exactly as the driver does."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Env as the driver would have it: no CPU forcing from conftest."""
    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_self_provisions_8_devices():
    # The function itself must set up the virtual mesh; no env vars passed.
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(8) PASSED" in proc.stdout


def test_dryrun_multichip_cli_invocation():
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "dryrun", "4"],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(4) PASSED" in proc.stdout


def test_dryrun_errors_clearly_when_backend_already_initialized():
    # If the caller initialized jax on 1 device first, we want a clear error,
    # not a bare assert.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); jax.devices();"
        "import __graft_entry__\n"
        "try:\n"
        "    __graft_entry__.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'fresh process' in str(e), e\n"
        "    print('CLEAR_ERROR_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "CLEAR_ERROR_OK" in proc.stdout
