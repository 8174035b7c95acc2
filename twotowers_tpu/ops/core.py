"""Elementary jit-compatible ops shared by towers, losses, and the index.

These are the XLA-fused building blocks: masked mean pooling (the reference
tower's pooling at /root/reference/twotower/encoders.py:62-77), L2
normalisation (torch ``F.normalize`` semantics), and cosine similarity (torch
``F.cosine_similarity`` semantics with its 1e-8 denominator clamp). Written
batch-major with static shapes so XLA fuses everything into the surrounding
matmuls on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

# Epsilon values chosen to match the reference numerics exactly:
# encoders.py:72 uses +1e-9 on the token-count denominator; torch
# F.normalize/F.cosine_similarity clamp norms at 1e-8/1e-12 respectively.
POOL_EPS = 1e-9
NORM_EPS = 1e-12
COSINE_EPS = 1e-8


def masked_mean_pool(embeddings: jnp.ndarray, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool token embeddings over non-pad positions.

    Args:
        embeddings: (..., seq_len, dim) token embeddings.
        token_ids: (..., seq_len) int ids; PAD is id 0.

    Returns:
        (..., dim) pooled vectors. All-pad rows pool to ~0 (eps-guarded).
    """
    mask = (token_ids > 0).astype(embeddings.dtype)[..., None]
    summed = jnp.sum(embeddings * mask, axis=-2)
    counts = jnp.sum(mask, axis=-2)
    return summed / (counts + jnp.asarray(POOL_EPS, embeddings.dtype))


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Unit-normalise along ``axis`` with torch F.normalize's eps clamp."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, jnp.asarray(NORM_EPS, x.dtype))


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Cosine similarity along ``axis`` (torch F.cosine_similarity semantics)."""
    a_norm = jnp.linalg.norm(a, axis=axis)
    b_norm = jnp.linalg.norm(b, axis=axis)
    dot = jnp.sum(a * b, axis=axis)
    denom = jnp.maximum(a_norm * b_norm, jnp.asarray(COSINE_EPS, a.dtype))
    return dot / denom
