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

# Test tiers (VERDICT r4 #7). The smoke tier is everything NOT in the
# heavy set: `pytest -m smoke` verifies the core in minutes on a fresh
# checkout; `pytest -m "not smoke"` runs the multi-minute PP/scan/
# multiprocess/e2e tier; `pytest -m tpu` needs the real chip. Membership
# below is from a measured --durations=0 run on this host (files whose
# tests sum to >60 s); slow/tpu-marked tests are heavy by definition.
_HEAVY_FILES = {
    # measured per-file totals (--durations=0 full run, this host):
    "test_3b_composition.py",   # 496 s
    "test_pipeline_pp.py",      # 468 s
    "test_optim8.py",           # 301 s
    "test_tpu_smoke.py",        # 203 s (real chip)
    "test_multiprocess.py",     # 197 s
    "test_full_loop.py",        # 133 s
    "test_reader_train.py",     # 81 s
    "test_beam_engine.py",      # 79 s
    "test_engine.py",           # 76 s
    "test_pp_1f1b.py",          # 71 s
    "test_scan_model.py",       # 62 s
    "test_pp_train.py",         # 35 s (PP compiles; grows with features)
    "test_flash_streamed.py",   # 34 s (interpret-mode Pallas)
}


def pytest_collection_modifyitems(config, items):
    # 1) auto-mark the smoke tier
    for item in items:
        heavy = ("slow" in item.keywords or "tpu" in item.keywords
                 or item.fspath.basename in _HEAVY_FILES)
        if not heavy:
            item.add_marker(pytest.mark.smoke)
    # 2) run on-chip tests FIRST in a full-suite invocation: the r4 full
    # run timed the TPU smoke test out purely because 40+ minutes of CPU
    # tests had saturated the host by the time it started
    items.sort(key=lambda it: 0 if "tpu" in it.keywords else 1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
