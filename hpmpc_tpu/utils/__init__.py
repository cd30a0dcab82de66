from . import mass_spring

__all__ = ["mass_spring"]
