from . import dedup, multimodal, similarity, text, window

__all__ = ["dedup", "similarity", "text", "window", "multimodal"]
