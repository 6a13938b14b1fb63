"""Tunnel/backend detection (`slide_tpu/utils/platform.py`).

The development chip's remote-tunnel runtime changed platform names between
rounds ("axon" -> plain "tpu") while keeping its no-donation semantics, so
detection is env-var based — these tests pin that contract.
"""

import jax

from slide_tpu.utils import platform as plat


def test_cpu_backend_is_not_tunnel(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert jax.default_backend() == "cpu"  # conftest forces CPU
    assert plat.is_remote_tunnel() is False
    assert plat.donation_safe() is True


def test_axon_env_detected_regardless_of_backend_name(monkeypatch):
    # newer tunnel runtimes register default_backend() == "tpu"; the stable
    # signal is the JAX_PLATFORMS the image's sitecustomize sets
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    assert plat.is_remote_tunnel() is True
    assert plat.donation_safe() is False


def test_axon_env_case_insensitive(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "AXON")
    assert plat.is_remote_tunnel() is True


def test_plain_cpu_env_is_not_tunnel(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert plat.is_remote_tunnel() is False
    assert plat.donation_safe() is True
