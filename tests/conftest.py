"""Test harness: force a fake 8-device CPU mesh before JAX initializes.

This is the fake-backend capability the reference lacks (SURVEY.md §4):
multi-chip sharding logic runs on `--xla_force_host_platform_device_count=8`
virtual CPU devices, so the full test suite needs no TPU.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def gr1t1_lower():
    from wiki_grx_gym_tpu.models.serialize import load_robot

    path = Path(__file__).resolve().parents[1] / "wiki_grx_gym_tpu/models/resources/gr1t1_lower_limb.json"
    return load_robot(str(path))
