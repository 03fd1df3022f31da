from . import (
    curation,
    dedup,
    multimodal,
    packing,
    retrieval,
    sampling,
    simsearch,
    textstats,
)

__all__ = [
    "curation",
    "dedup",
    "multimodal",
    "packing",
    "retrieval",
    "sampling",
    "simsearch",
    "textstats",
]
