from . import sketch, skew, text, vector

__all__ = ["sketch", "skew", "text", "vector"]
