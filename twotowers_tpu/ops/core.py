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


def _safe_norm(x: jnp.ndarray, axis, keepdims: bool, eps: float) -> jnp.ndarray:
    """L2 norm whose gradient is zero (not NaN) at x == 0.

    ``sqrt`` has an infinite derivative at 0, so a plain ``linalg.norm`` of an
    exactly-zero vector (an all-pad row) produces NaN gradients that poison
    the whole batch even when that row's loss is weight-masked (0 * NaN = NaN
    in reverse-mode). Clamping *inside* the sqrt makes the derivative 0 there
    while leaving the forward value identical: for norm >= eps the sqrt is
    exact, and below eps the caller's denominator clamp dominates anyway.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, jnp.asarray(eps * eps, sq.dtype)))


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Unit-normalise along ``axis`` with torch F.normalize's eps clamp."""
    norm = _safe_norm(x, axis, keepdims=True, eps=NORM_EPS)
    return x / jnp.maximum(norm, jnp.asarray(NORM_EPS, x.dtype))


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Cosine similarity along ``axis`` (torch F.cosine_similarity semantics)."""
    a_norm = _safe_norm(a, axis, keepdims=False, eps=NORM_EPS)
    b_norm = _safe_norm(b, axis, keepdims=False, eps=NORM_EPS)
    dot = jnp.sum(a * b, axis=axis)
    denom = jnp.maximum(a_norm * b_norm, jnp.asarray(COSINE_EPS, a.dtype))
    return dot / denom
