"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4.4).

Note: this image registers a TPU ('axon') PJRT plugin from sitecustomize at
interpreter start, so JAX_PLATFORMS env munging is too late — we override via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# On this 1-vCPU host a heavily-collective program timeshares 8 device
# threads on one core; XLA CPU's default 40 s collective-rendezvous
# terminate timeout then SIGABRTs a run that is merely slow, not stuck
# (it killed a full-suite run at test_graft_entry in round 2). These flags
# are harmless for every other test and must match __graft_entry__'s so the
# backend is initialized with them no matter which test runs first.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocesses spawned by tests (GUI worker -> CLI, dryrun helpers) cannot
# rely on JAX_PLATFORMS: this image's sitecustomize rewrites it to the TPU
# relay at every interpreter start. The CLIs honor this override instead
# (utils/platform.py), applied via jax.config after import.
os.environ.setdefault("UNETDC_TPU_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Opt-in persistent compile cache for the suite: the heaviest tests spend
# minutes in XLA:CPU compiles of the same megastep/train programs every
# run (the int8 e2e megastep alone is ~4.5 min on this 1-vCPU host).
# UNETDC_TPU_COMPILE_CACHE=<dir> reuses them across runs, same opt-in knob
# as the CLIs (utils/compile_cache.py). Off by default: cache-free runs
# are the calibration the suite timing claims are based on.
if os.environ.get("UNETDC_TPU_COMPILE_CACHE"):
    from unetdc_tpu.utils.compile_cache import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
