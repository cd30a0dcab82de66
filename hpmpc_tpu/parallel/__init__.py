from . import batch, multihost

__all__ = ["batch", "multihost"]
