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
import resource

# XLA:CPU compilation of the large differentiable-SPPM programs has
# segfaulted inside backend_compile_and_load with the default 8 MB stack
# in long full-suite runs (the crash wanders between the big compiles and
# never reproduces standalone — the signature of stack exhaustion).  The
# main thread's stack grows on demand up to the soft rlimit, and glibc
# sizes new pthread stacks from it too, so raise it before jax initializes.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (512 << 20, _hard))
except (ValueError, OSError):
    pass

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel codegen has segfaulted nondeterministically while
    # compiling the largest differentiable-SPPM backward modules in long
    # full-suite runs (crash inside backend_compile_and_load; never
    # reproduces standalone).  Serial codegen trades a little compile time
    # for reliability on this 2-CPU box.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the number of live compiled executables.

    A full-suite run accumulates ~500 compiled programs in one process,
    after which XLA:CPU deterministically segfaults while compiling the
    largest differentiable-SPPM module (jax 0.9.0 on this box; any half of
    the suite + that compile passes, the full set crashes — a compiler
    resource-accumulation failure, not a test bug).  Dropping caches at
    module teardown keeps the live set at per-module size; cross-module
    recompiles cost a few extra minutes."""
    yield
    jax.clear_caches()
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it
jax.config.update("jax_threefry_partitionable", True)

# Persistent compile cache DISABLED (was: ~/.cache/gpu_pathtracer_tpu_jax
# with min_compile_time 0): with r04's large differentiable-SPPM
# executables the cache serializer crashed the interpreter twice — once
# SIGABRT in get_executable_and_time on a corrupted entry (two concurrent
# pytest runs write the same keys), once SIGSEGV in put_executable_and_time
# on a clean cache.  CPU compiles of the test-sized programs are cheap;
# correctness beats the saved minutes.  Opt back in explicitly with
# GPT_TPU_TEST_CACHE=1.
if os.environ.get("GPT_TPU_TEST_CACHE"):
    _CACHE_DIR = os.path.expanduser("~/.cache/gpu_pathtracer_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
