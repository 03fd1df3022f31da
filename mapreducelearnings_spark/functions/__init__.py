from . import skew, text, vector

__all__ = ["skew", "text", "vector"]
