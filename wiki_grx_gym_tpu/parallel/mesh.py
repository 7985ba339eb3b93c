"""Device mesh construction — the framework's communication backend.

The reference has no operative distributed backend (a dead ``--horovod``
flag, `legged_gym/utils/helpers.py:169`; all comms are intra-device PhysX <->
torch pointer sharing). Here scale-out is first-class (SURVEY.md §2.6):

- a ``Mesh`` with a ``dp`` axis shards the embarrassingly-parallel env batch;
  physics needs **zero** cross-device communication;
- an optional ``mp`` axis tensor-parallelizes the MLP hidden layers (unused
  by default — the GRx policy is small — but wired so TP of wider policies
  is a config change);
- gradients are reduced by XLA SPMD (an all-reduce over ``dp`` emitted from
  sharding annotations), riding ICI within a slice and DCN across slices;
- multi-host initialization via `jax.distributed`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_mp: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "mp") mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % num_mp == 0, (n, num_mp)
    arr = np.asarray(devices).reshape(n // num_mp, num_mp)
    return Mesh(arr, ("dp", "mp"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (env) axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (`jax.distributed.initialize`). No-op when
    environment variables already configure the cluster (TPU pods)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
