from .iterate import iterate

__all__ = ["iterate"]
