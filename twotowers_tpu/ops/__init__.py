"""Pure jit-compatible compute ops (XLA reference paths + Pallas kernels)."""

from .core import cosine_similarity, l2_normalize, masked_mean_pool

__all__ = ["cosine_similarity", "l2_normalize", "masked_mean_pool"]
