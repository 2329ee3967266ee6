from .batch import Request, batch_generate
from .metrics import ServingMetrics

__all__ = ["Request", "batch_generate", "ServingMetrics"]
