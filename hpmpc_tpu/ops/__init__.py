from . import tri

__all__ = ["tri"]
