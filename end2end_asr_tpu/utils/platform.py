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
    # Only re-assert builtin platform names (the CPU dry-run/test case).
    # Plugin platforms (e.g. this image's 'axon') may be registered by
    # sitecustomize under a different backend name — re-setting the raw
    # env value breaks their resolution, so leave them alone.
    if env not in ("cpu", "tpu", "gpu"):
        return
    try:
        import jax
        jax.config.update("jax_platforms", env)
    except Exception:
        pass
