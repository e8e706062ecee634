"""Persistent XLA compilation cache.

On tunneled TPU runtimes compilation is remote and costs minutes per program;
the jax persistent cache cuts repeat setup to seconds.  Enabled automatically
by Hierarchy setup; opt out with MFMG_TPU_NO_CACHE=1 or pick a location with
MFMG_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("MFMG_TPU_NO_CACHE"):
        return
    import jax

    # Only cache for accelerator backends: CPU compiles are fast locally, and
    # CPU AOT executables produced by a remote compile service carry target
    # features the local host may lack (SIGILL risk).
    import jax
    backend = jax.default_backend()
    if backend == "cpu":
        _enabled = True
        return
    path = path or os.environ.get("MFMG_TPU_CACHE_DIR") or os.path.expanduser(
        "~/.cache/mfmg_tpu_xla")
    path = os.path.join(path, backend)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
