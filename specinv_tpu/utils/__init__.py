from .runner import iterate

__all__ = ["iterate"]
