"""The driver-facing entry points must work with ZERO caller setup.

Round-1 failure: the driver invoked ``dryrun_multichip`` without forcing
the CPU platform, the axon sitecustomize routed backend init to a
mismatched libtpu, and MULTICHIP_r01.json recorded rc=1.  These tests
run the entry in a pristine subprocess — no XLA_FLAGS, no platform
pre-configuration — exactly as the driver does.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_itself():
    """dryrun_multichip(8) must pass without the caller pre-configuring
    the platform or device count."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_survives_preinitialized_backend():
    """Even if the calling process already initialized a backend on a
    different platform, the dry run must fall back to a clean child."""
    # Pre-initialize a 1-device CPU backend: the in-process path then
    # cannot supply 8 devices, forcing the clean-subprocess fallback
    # (without touching the real TPU from inside the test suite).
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


def test_glsr_step_composition_on_mesh():
    """The GLSR finite-difference double-decode is the one trainer
    composition with two extra decoder unrolls in its backward graph
    (VERDICT r4 item 5) — it must compile + execute on the full
    8-device data mesh AND a (4,2) data×model submesh."""
    from arvae_tpu.parallel import create_mesh

    import __graft_entry__ as g

    g._dryrun_glsr_step(create_mesh(), batch=16)
    g._dryrun_glsr_step(
        create_mesh(data_parallel=4, model_parallel=2), batch=16)
