"""Native (C++) runtime components, compiled on first use with g++ and
loaded via ctypes (pybind11 is not available in the image).

`SLIDE_TPU_NATIVE=0` disables every native path; each caller falls back to
its pure-python/numpy implementation.
"""

from slide_tpu.native.build import load_library, native_enabled

__all__ = ["load_library", "native_enabled"]
