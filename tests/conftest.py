"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so that multi-chip sharding
tests run anywhere (the TPU-native answer to testing pod-slice code without
a pod slice — see SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax (to register the axon TPU
plugin) BEFORE pytest loads conftest, so plain os.environ tweaks are too
late.  jax.config.update works after import and avoids the (slow) TPU-tunnel
backend initialization entirely.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it
jax.config.update("jax_threefry_partitionable", True)

# persistent compile cache: repeat test runs skip recompilation
_CACHE_DIR = os.path.expanduser("~/.cache/gpu_pathtracer_tpu_jax")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
