"""Test configuration: hermetic CPU-only JAX with an 8-device virtual mesh.

Mirrors the reference's hermetic test strategy (misopy/test_miso.py runs the
whole pipeline on checked-in fixtures) while adding the multi-device test
path the reference lacks (SURVEY.md section 4).
"""
import os

# Must be set before jax is imported anywhere.  Overrides any
# externally-set platform (the session may default to a TPU backend).
# The axon TPU plugin registers itself from sitecustomize whenever
# PALLAS_AXON_POOL_IPS is set, bypassing JAX_PLATFORMS -- drop it so the
# suite is hermetic CPU.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The plugin's register() overrides the platform config directly, so the
# env var alone is not enough -- force it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 20260817
