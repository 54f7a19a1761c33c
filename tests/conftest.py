"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analog of a fake backend (SURVEY.md §4): sharding/collective
code paths compile and run on 8 virtual CPU devices, so multi-chip logic is tested
without TPU hardware.

Note: this environment pre-imports jax via sitecustomize with JAX_PLATFORMS=axon,
so env-var setdefault is too late — we must override through jax.config before the
backend initializes (it is lazy, so this works as long as no test ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
