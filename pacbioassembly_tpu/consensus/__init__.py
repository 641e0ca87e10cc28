from .state import ConsensusRef

__all__ = ["ConsensusRef"]
