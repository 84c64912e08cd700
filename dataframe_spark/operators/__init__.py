from . import dedup, multimodal, quantiles, similarity, text, window

__all__ = ["dedup", "quantiles", "similarity", "text", "window", "multimodal"]
