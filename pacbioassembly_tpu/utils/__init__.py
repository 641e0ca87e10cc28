from .metrics import MetricsLogger, profiled

__all__ = ["MetricsLogger", "profiled"]
