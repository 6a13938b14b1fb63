"""Regression tests for the driver entry points (`__graft_entry__.py`).

Round-1 failure (`MULTICHIP_r01.json`): the driver runs `dryrun_multichip(8)`
in an environment where JAX_PLATFORMS points at a real (and possibly broken)
TPU tunnel and only one physical device exists.  An import-time `jnp.*`
allocation initialised that backend and crashed before the dryrun could force
CPU.  These tests run the dryrun in a fresh subprocess WITHOUT conftest's
env fixes, reproducing the driver's environment.
"""

import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(env_overrides, n=8):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver may or may not pass the device-count flag
    env.update(env_overrides)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = f"import __graft_entry__ as g; g.dryrun_multichip({n})"
    return subprocess.run([sys.executable, "-c", code], cwd=_REPO_ROOT, env=env,
                          capture_output=True, text=True, timeout=900)


def test_dryrun_multichip_with_tpu_platform_env():
    """JAX_PLATFORMS=axon in env (the production failure mode) must still pass:
    the dryrun forces the CPU platform before any backend use."""
    r = _run_dryrun({"JAX_PLATFORMS": "axon"})
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "sharded train steps OK" in r.stdout
    assert "sharded generation OK" in r.stdout


def test_dryrun_multichip_after_backend_init():
    """Even if a 1-device backend is already initialised in-process, the
    subprocess fallback must produce a passing 8-device dryrun."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; assert len(jax.devices()) == 1; "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    r = subprocess.run([sys.executable, "-c", code], cwd=_REPO_ROOT, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "sharded train steps OK" in r.stdout
    assert "sharded generation OK" in r.stdout


def test_no_import_time_device_allocation():
    """Importing slide_tpu (all subpackages) must not initialise any backend.
    Guards against a regression of nn/modules.py's import-time jnp.linspace."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_platform"  # any backend init would raise
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import slide_tpu, slide_tpu.models, slide_tpu.nn, slide_tpu.ops, "
            "slide_tpu.diffusion, slide_tpu.sap, slide_tpu.data, slide_tpu.train, "
            "slide_tpu.eval, slide_tpu.cli, slide_tpu.vis, slide_tpu.utils, "
            "slide_tpu.parallel, slide_tpu.configs; print('import-ok')")
    r = subprocess.run([sys.executable, "-c", code], cwd=_REPO_ROOT, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "import-ok" in r.stdout
