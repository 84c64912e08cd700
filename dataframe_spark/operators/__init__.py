from . import (
    dedup,
    dsir,
    embeddings,
    graph,
    multimodal,
    quantiles,
    similarity,
    sketch,
    text,
    window,
)

__all__ = [
    "dedup",
    "dsir",
    "embeddings",
    "graph",
    "multimodal",
    "quantiles",
    "similarity",
    "sketch",
    "text",
    "window",
]
