"""Packaging parity (reference `setup.py` / `pointnet2_ops_lib/setup.py`):
the project installs as a package with a working `slide` console script."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=300, **kw)


def test_editable_install_present_or_installable():
    """`pip install -e .` has been run (the image pre-installs it) or
    succeeds now; either way the distribution resolves."""
    try:
        from importlib.metadata import distribution
        dist = distribution("slide-tpu")
    except Exception:
        r = _run([sys.executable, "-m", "pip", "install", "-e", REPO,
                  "--no-deps", "--no-build-isolation"])
        assert r.returncode == 0, r.stderr[-2000:]
        from importlib.metadata import distribution
        dist = distribution("slide-tpu")
    assert dist.version


def test_console_script_help():
    """`slide --help` lists every subcommand (the reference ships its tools
    as bare scripts; ours is one console entry point)."""
    r = _run([sys.executable, "-m", "slide_tpu.cli.main", "--help"])
    assert r.returncode == 0, r.stderr[-2000:]
    for sub in ("train", "generate", "latent-generate", "encode", "decode",
                "reconstruct", "gather", "evaluate"):
        assert sub in r.stdout


def test_import_surface():
    """Top-level package imports cleanly in a fresh interpreter (no
    import-time device allocation — round-2 regression)."""
    r = _run([sys.executable, "-c",
              "import slide_tpu, slide_tpu.ops, slide_tpu.models, "
              "slide_tpu.diffusion, slide_tpu.sap, slide_tpu.eval; "
              "print(slide_tpu.__name__)"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "slide_tpu" in r.stdout
