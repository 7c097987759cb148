"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding path is exercised without TPU hardware (SURVEY.md §4.3). The env
vars must be set before the first ``import jax`` anywhere in the process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); the env var
# cannot be overridden from outside, so force the CPU backend via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def transform_dict():
    return dict(
        distance_above_target=3.0,
        focal_length=1.0,
        meters_to_pixels=300.0,
        screen_center=(128.0, 128.0),
    )


@pytest.fixture
def lights_dict():
    return dict(
        ambient=(0.3, 0.3, 0.3, 1.0),
        light_p=np.array([[2.0, 2.0, 1.0], [-2.0, 1.0, 2.0]], np.float32),
        light_intensity=np.array(
            [[0.8, 0.8, 0.8, 1.0], [0.3, 0.2, 0.1, 1.0]], np.float32
        ),
    )
