from . import dedup, multimodal, simsearch, textstats

__all__ = ["dedup", "multimodal", "simsearch", "textstats"]
