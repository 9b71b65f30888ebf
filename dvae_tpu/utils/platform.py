"""Backend platform override for pinned-plugin hosts.

JAX's standard `JAX_PLATFORMS` env var is read once by the plugin layer,
and on hosts that pin a platform plugin (e.g. a tunneled TPU runtime that
registers itself as the default backend) the pin wins over the env var --
the only effective override is `jax.config.update("jax_platforms", ...)`
BEFORE any backend initialization. That makes it impossible to run the
CLIs (training driver, REPL, eval scripts, benches) on CPU on such hosts
without editing code: exactly what you want during a device outage, on a
dev box, or in CI.

`DVAE_PLATFORM` closes that gap: every entry point calls
`apply_platform_override()` first thing, so

    DVAE_PLATFORM=cpu python run.py configs/sfu/vae_adv+mi.json

trains on the host CPU regardless of what the image pins. Unset (the
default), nothing is touched and the platform resolves exactly as before.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

ENV_VAR = "DVAE_PLATFORM"


def apply_platform_override(default: Optional[str] = None) -> Optional[str]:
    """Apply `DVAE_PLATFORM` (or `default`) via jax.config.

    Returns the platform string applied, or None when no override is
    requested. Never raises: if the backend is already initialized (too
    late to switch), the failure is logged and the process continues on
    the existing platform.
    """
    plat = os.environ.get(ENV_VAR, "").strip() or default
    if not plat:
        return None
    try:
        import jax
        jax.config.update("jax_platforms", plat)
        return plat
    except Exception:
        logging.warning(
            f"could not apply {ENV_VAR}={plat!r} (backend already "
            "initialized?); continuing on the default platform",
            exc_info=True)
        return None
