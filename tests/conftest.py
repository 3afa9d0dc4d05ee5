"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md §4).

NOTE: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a remote-TPU PJRT plugin), so setting os.environ here
is too late for jax.config's env capture — we must update the config
explicitly before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
