"""Test harness configuration.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes so that
multi-chip sharding tests run anywhere (the TPU-native answer to testing
pod-slice code without a pod slice — see SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

# persistent compile cache: repeat test runs skip recompilation
_CACHE_DIR = os.path.expanduser("~/.cache/gpu_pathtracer_tpu_jax")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
