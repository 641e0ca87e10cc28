from .state import ConsensusRef

__all__ = ["ConsensusRef"]

# Device forms live in .device (imported lazily by users so that the
# host-only CLI paths never pay the jax import).
