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

# If a TPU-pool PJRT plugin (axon) was registered by sitecustomize, drop its
# lazy factory before first backend use: CPU tests must never dial the TPU
# pool (its grant-claim can block for minutes).
try:  # pragma: no cover - environment specific
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# sitecustomize may have imported jax before this file ran, freezing
# JAX_PLATFORMS=axon from the environment — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def gr1t1_lower():
    from wiki_grx_gym_tpu.models.serialize import load_robot

    path = Path(__file__).resolve().parents[1] / "wiki_grx_gym_tpu/models/resources/gr1t1_lower_limb.json"
    return load_robot(str(path))
