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


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for the CLI entry points.

    TPU compiles are expensive (minutes for the big grad programs with
    Pallas kernels, one per bucket shape), and training runs recompile
    them on every process start. The persistent cache serializes the
    compiled executables to disk so reruns, resumes and test.py reuse
    them. OPT-IN: set JAX_COMPILATION_CACHE_DIR to a directory.
    (Not on by default: through this dev image's remote-TPU tunnel,
    re-LOADING a cached executable measured 3.7x SLOWER than a fresh
    server-side compile — 190 s vs 51 s to the first train step — so
    the cache only pays off on directly-attached TPUs.)"""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path or path == "0":
        return
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
