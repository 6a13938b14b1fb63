"""TPU-only persistent compilation cache for chip workloads.

Every chip script shares benchmarks/.jax_cache so the tunnel's slow first
compiles (minutes for the full-size AE/SAP) are paid once.  But the axon
relay compiles *cpu-backend* executables on the tunnel-side host (an
AMX-class machine): any ``JAX_PLATFORMS=axon,cpu`` process that traces its
init on the cpu backend writes tunnel-host CPU AOT artifacts into the
shared dir, and a later *local* cpu-backend load of such an entry risks
SIGILL ("prefer-no-scatter is not supported on the host machine" —
cpu_aot_loader warnings; one full pytest run died mid-suite this way, see
CLAUDE.md round-5 notes).

``enable_tpu_only_cache()`` sets the cache dir and patches jax's
``_cache_read`` / ``_cache_write`` to bypass the persistent cache for cpu
backends entirely — TPU executables keep hitting the shared cache, cpu
init traces are compiled fresh every run (they are cheap), and the dir can
no longer self-poison.
"""
from __future__ import annotations

import os

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
_patched = False


def enable_tpu_only_cache(cache_dir: str = _CACHE_DIR) -> None:
    """Point jax's persistent compilation cache at ``cache_dir`` and make it
    ignore cpu-backend executables (read and write)."""
    global _patched
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return
    if _patched:
        return
    try:
        from jax._src import compiler as _compiler

        _orig_read = _compiler._cache_read
        _orig_write = _compiler._cache_write

        def _cache_read(module_name, cache_key, compile_options, backend,
                        executable_devices):
            if getattr(backend, "platform", None) == "cpu":
                return None, None
            return _orig_read(module_name, cache_key, compile_options,
                              backend, executable_devices)

        def _cache_write(cache_key, compile_time_secs, module_name, backend,
                         executable, host_callbacks):
            if getattr(backend, "platform", None) == "cpu":
                return
            return _orig_write(cache_key, compile_time_secs, module_name,
                               backend, executable, host_callbacks)

        _compiler._cache_read = _cache_read
        _compiler._cache_write = _cache_write
        _patched = True
    except Exception:
        # private-API drift: fall back to plain shared caching rather than
        # failing the workload; the purge rule in CLAUDE.md still applies
        pass
