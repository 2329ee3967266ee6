from .batch import Request, batch_generate

__all__ = ["Request", "batch_generate"]
