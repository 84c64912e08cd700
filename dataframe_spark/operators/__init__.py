from . import (
    dedup,
    dsir,
    encode,
    embeddings,
    graph,
    multimodal,
    quantiles,
    scale,
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
    "scale",
    "similarity",
    "sketch",
    "text",
    "window",
]
