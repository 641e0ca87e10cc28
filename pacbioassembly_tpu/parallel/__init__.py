from .mesh import initialize_multihost, make_mesh
from .sharded import (
    VoteDelta,
    assembly_step,
    device_elect,
    jit_elect,
    sharded_elect,
    sharded_screen,
)

__all__ = [
    "VoteDelta",
    "assembly_step",
    "device_elect",
    "initialize_multihost",
    "jit_elect",
    "make_mesh",
    "sharded_elect",
    "sharded_screen",
]
