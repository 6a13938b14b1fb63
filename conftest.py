"""Root conftest: make `slide_tpu` importable and force a virtual 8-device CPU mesh
for tests (SURVEY.md §4: CPU-device-count mesh tests for the sharded train step).

Must run before jax is imported anywhere in the test session.
"""
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Tests always run on CPU with 8 virtual devices so sharding logic is exercised
# without TPU hardware. Benchmarks (bench.py) run on the real chip instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The machine image preloads jax configured for the TPU tunnel via a
# sitecustomize on PYTHONPATH, so the env var alone is too late — override the
# already-imported config as well (safe: the backend initializes lazily).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
