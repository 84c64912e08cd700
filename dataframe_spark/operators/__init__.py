from . import dedup, embeddings, graph, multimodal, quantiles, similarity, text, window

__all__ = ["dedup", "embeddings", "graph", "quantiles", "similarity", "text", "window", "multimodal"]
