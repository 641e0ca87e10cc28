from .reads import ReadStore
from .driver import Assembler, init_reference

__all__ = ["ReadStore", "Assembler", "init_reference"]
