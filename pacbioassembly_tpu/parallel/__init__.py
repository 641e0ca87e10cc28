from .mesh import make_mesh
from .sharded import assembly_step, sharded_elect, sharded_screen

__all__ = ["make_mesh", "assembly_step", "sharded_elect", "sharded_screen"]
