from . import (
    dedup,
    dsir,
    encode,
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
    "encode",
    "embeddings",
    "graph",
    "multimodal",
    "quantiles",
    "similarity",
    "sketch",
    "text",
    "window",
]
