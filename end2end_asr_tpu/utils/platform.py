"""Platform selection helper.

This image's sitecustomize force-sets jax_platforms at interpreter start
(remote-TPU PJRT plugin), clobbering the JAX_PLATFORMS environment
variable. Entry points call honor_env_platform() so a user-exported
JAX_PLATFORMS (e.g. cpu for tests/dry-runs) wins, as stock JAX behaves.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax
        jax.config.update("jax_platforms", env)
    except Exception:
        pass
