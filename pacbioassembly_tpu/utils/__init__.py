from .compile_cache import enable_compilation_cache
from .metrics import MetricsLogger, profiled

__all__ = ["MetricsLogger", "profiled", "enable_compilation_cache"]
