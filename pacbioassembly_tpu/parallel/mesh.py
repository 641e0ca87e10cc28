"""Device mesh helpers.

The engine's parallelism is 1-D data parallelism over candidate alignments
("dp" axis): reads/candidates shard across chips, the reference text and
seed index replicate, and vote tensors merge with psum (SURVEY.md §2.4).
Multi-host runs extend the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))
