"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware (SURVEY §4d)."""

import os

# Force CPU even when the outer environment points JAX at a TPU: tests
# must be hermetic and the virtual 8-device mesh only exists on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already have been imported by a pytest plugin before this
# conftest runs; config updates still apply as long as no backend has
# been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compile cache: the test host has ONE core, so CPU
# compiles dominate suite wall time (fast tier ~218 s cold).  Caching
# compiled executables across pytest runs cuts repeat runs ~3-4x
# (measured 21.1 s -> 5.5 s on the heaviest fleet equality test).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("UMX_TEST_CACHE_DIR", "/tmp/umx_tpu_xla_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from umx_tpu.config import DSPConfig, EngineConfig, ModelConfig, SegmentConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> EngineConfig:
    """A scaled-down engine config so tests run in seconds on CPU: same
    DSP constants, UMX-HQ-sized network, 2-second segments."""
    return EngineConfig(
        model=ModelConfig(hidden_size=64),
        segment=SegmentConfig(segment_secs=2.0),
    )


@pytest.fixture(scope="session")
def small_params(small_cfg):
    from umx_tpu.models.umx import synthetic_params

    return synthetic_params(small_cfg.model, seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def dsp_cfg() -> DSPConfig:
    return DSPConfig()
