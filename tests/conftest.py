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

# Persistent compilation cache (same dir the multichip dryrun ships
# pre-populated): the suite is compile-bound on this 1-vCPU host — the
# fast tier alone costs ~32 min cold vs minutes warm. Entries are keyed
# on HLO + flags, so CPU test programs and the dryrun's coexist.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # ops/partition.py rules embed a per-process callback pointer in
    # backend_config; strip it or the cache never hits across processes.
    jax.config.update(
        "jax_remove_custom_partitioning_ptr_from_cache_key", True)
except Exception:
    pass  # older jax without these knobs: run cold
