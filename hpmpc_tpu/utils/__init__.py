from . import mass_spring, mhe_data

__all__ = ["mass_spring", "mhe_data"]
