from . import riccati

__all__ = ["riccati"]
