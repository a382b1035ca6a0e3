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
# suite is hermetic CPU.  MISO_TEST_TPU=1 keeps the real accelerator
# (needed for tests/test_pallas.py).
if os.environ.get("MISO_TEST_TPU") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # The plugin's register() overrides the platform config directly, so
    # the env var alone is not enough -- force it back after import.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 20260817
