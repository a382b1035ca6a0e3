"""Test configuration: hermetic CPU-only JAX with an 8-device virtual mesh.

Mirrors the reference's hermetic test strategy (misopy/test_miso.py runs the
whole pipeline on checked-in fixtures) while adding the multi-device test
path the reference lacks (SURVEY.md section 4).
"""
import os

# Must be set before jax is imported anywhere.  Overrides any
# externally-set platform (the session may default to a TPU backend).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 20260817
