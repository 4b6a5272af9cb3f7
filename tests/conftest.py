"""Test configuration: CPU backend with 8 virtual devices.

The reference has no multi-device tests at all (SURVEY.md section 4); here the
CPU host platform is split into 8 XLA devices so mesh/sharding paths are
exercised everywhere without TPU hardware. Note: under the axon TPU tunnel
``JAX_PLATFORMS`` is ignored; ``JAX_PLATFORM_NAME`` + config must be used.
"""
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nfmc_tpu_jax_cache_cpu")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite compiles hundreds of distinct CPU
# programs; re-runs load them from disk instead of recompiling.
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _seed():
    import nfmc_tpu

    nfmc_tpu.set_seed(0)
    yield


def standard_gaussian_potential(x):
    """U(x) = 0.5 * sum(x^2); mirrors reference ``test/util.py``."""
    return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)


def small_flow(event_shape=(5,), seed=1):
    from nfmc_tpu.flows import Flow, RealNVP

    return Flow(RealNVP(event_shape, n_layers=2, hidden_size=16), seed=seed)


@pytest.fixture
def gauss_target():
    return standard_gaussian_potential
