"""Persistent XLA compilation cache.

The fused train step / whole-epoch program costs minutes of XLA compile at
flagship scale (9+ min first epoch, benchmarks/RESULTS.md) and the
streaming Pallas CE ~10 more -- costs that were being paid by EVERY fresh
process (driver, bench, eval sessions) because nothing set
`jax_compilation_cache_dir`. This module turns those into a one-time cost:
the first process compiles and persists the executable; every later
process with the same program + jaxlib + flags deserializes it in seconds.

The reference has no analogue (eager torch recompiles nothing); this is
pure TPU-build infrastructure. Config key: `compilation_cache_dir`
("auto" -> ~/.cache/dvae_tpu/xla_cache; "" disables; any other string is
used as the directory).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_enabled_dir: Optional[str] = None


def default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "dvae_tpu",
                        "xla_cache")


def enable_compilation_cache(cache_dir: str = "auto") -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir`.

    - "auto": use default_cache_dir().
    - "": disabled (returns None, touches nothing).
    - min_compile_time is set to 0 so even mid-sized programs (the eval
      epoch, the REPL forwards) persist, and XLA's own autotune/kernel
      caches are included where supported.

    Safe to call more than once (idempotent; a second DIFFERENT directory
    wins and is logged). Never raises: a read-only home or full disk must
    not take down training, so failures degrade to cold compiles with a
    warning.
    """
    global _enabled_dir
    if not cache_dir:
        return None
    if cache_dir == "auto":
        cache_dir = default_cache_dir()
    cache_dir = os.path.abspath(cache_dir)
    if _enabled_dir == cache_dir:
        return cache_dir
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "all")
        except Exception:
            pass  # older jaxlibs: executable cache still works
        _enabled_dir = cache_dir
        logging.info(f"XLA compilation cache at {cache_dir}")
        return cache_dir
    except Exception:
        logging.warning("could not enable the XLA compilation cache; "
                        "compiles will be cold", exc_info=True)
        return None
