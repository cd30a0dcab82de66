from . import stage_kernel, tri

__all__ = ["stage_kernel", "tri"]
