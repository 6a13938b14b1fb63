"""Pallas TPU kernels behind the same APIs as the pure-jnp ops (SURVEY.md
§7.2 step 8).  Each kernel has an interpret-mode path so the numerics are
testable on CPU."""

from slide_tpu.ops.pallas.fps import fps_pallas, pallas_available

__all__ = ["fps_pallas", "pallas_available"]
