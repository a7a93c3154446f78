"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Must set the environment before jax initializes its backends, hence the
top-of-module placement.  Benchmarks (bench.py) run on real TPU hardware and
do not import this.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Pin the compile target ISA: the sandbox reports inconsistent CPUID
    # across processes, and AOT cache entries compiled with a wider ISA
    # can mis-execute when loaded by a process that detects a narrower one
    # (observed as rare flaky numeric failures).
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The JAX_PLATFORMS env var is overridden to "axon,cpu" by the environment's
# TPU plugin; config.update is the authoritative way to pin tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: process startup and XLA compiles are very
# slow on this sandbox; cache aggressively.  NOTE: must be a cache dir
# separate from TPU-connected runs — those write CPU AOT entries compiled
# for the *remote* tunnel host's CPU features, which mis-execute here.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
