"""Device mesh helpers.

The engine's parallelism is 1-D data parallelism over candidate alignments
("dp" axis): reads/candidates shard across chips, the reference text and
seed index replicate, and vote tensors merge with psum (SURVEY.md §2.4).
Multi-host runs extend the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Join a multi-host run and return the global dp mesh.

    Call once per host before any jax computation; with no arguments JAX
    auto-detects the cluster (TPU pod metadata). Every chip on every host
    joins the single dp axis — the assembly step's psum then rides ICI
    within a slice and DCN across hosts with no code changes
    (SURVEY.md §2.4).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return make_mesh()
