"""Encoder towers: token embeddings -> one L2-normalised vector per text.

Capability parity with /root/reference/twotower/encoders.py (MeanPoolingTower,
AveragePoolingTower, TwoTower wrapper with tied/untied weights, registry), but
functional: towers are (init, apply) pairs over explicit param pytrees, the
embedding table is a shared sub-tree (the reference shares one embedding
module between both towers, encoders.py:251-272), and everything is
jit/pjit-compatible with static shapes. bf16 compute is a spec flag; params
stay f32 and the final L2 norm runs in f32 for stable unit vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import l2_normalize, masked_mean_pool
from ..utils.registry import Registry
from .embeddings import EmbeddingSpec, embed_ids, init_embedding

TOWER_REGISTRY = Registry("tower")

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TowerSpec:
    """Static configuration of one tower architecture.

    kernel_size / num_layers / num_heads / max_len only apply to the
    sequence towers (cnn / rnn / transformer, see seq_towers.py).
    """

    arch: str
    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.1
    kernel_size: int = 3
    num_layers: int = 2
    num_heads: int = 4
    max_len: int = 128


@dataclasses.dataclass(frozen=True)
class TwoTowerSpec:
    """Static configuration of the full dual-encoder model."""

    embedding: EmbeddingSpec
    tower: TowerSpec
    tied_weights: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def output_dim(self) -> int:
        if self.tower.arch == "avg_pool" and self.tower.hidden_dim == self.embedding.embedding_dim:
            return self.embedding.embedding_dim
        return self.tower.hidden_dim


def _linear_init(rng: jax.Array, fan_in: int, fan_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    w_rng, b_rng = jax.random.split(rng)
    w = jax.random.uniform(w_rng, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(b_rng, (fan_out,), jnp.float32, -bound, bound)
    return w, b


# ---------------------------------------------------------------------------
# mean: masked mean-pool -> Linear -> ReLU -> Linear -> L2 norm
# (reference MeanPoolingTower, encoders.py:25-81)
# ---------------------------------------------------------------------------

def _mean_init(rng: jax.Array, spec: TowerSpec) -> Params:
    r1, r2 = jax.random.split(rng)
    w1, b1 = _linear_init(r1, spec.embedding_dim, spec.hidden_dim)
    w2, b2 = _linear_init(r2, spec.hidden_dim, spec.hidden_dim)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def _mean_apply(params: Params, spec: TowerSpec, pooled: jnp.ndarray, *,
                train: bool = False, dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    del train, dropout_rng
    h = jnp.maximum(pooled @ params["w1"] + params["b1"], 0.0)
    out = h @ params["w2"] + params["b2"]
    return l2_normalize(out.astype(jnp.float32))


TOWER_REGISTRY.add("mean", (_mean_init, _mean_apply))


# ---------------------------------------------------------------------------
# avg_pool: masked mean-pool -> optional (Linear -> Dropout -> LayerNorm) -> L2
# (reference AveragePoolingTower, encoders.py:84-155; projection only when
# hidden_dim != embedding_dim)
# ---------------------------------------------------------------------------

def _avg_pool_init(rng: jax.Array, spec: TowerSpec) -> Params:
    if spec.hidden_dim == spec.embedding_dim:
        return {}
    w, b = _linear_init(rng, spec.embedding_dim, spec.hidden_dim)
    return {
        "proj_w": w,
        "proj_b": b,
        "ln_scale": jnp.ones((spec.hidden_dim,), jnp.float32),
        "ln_bias": jnp.zeros((spec.hidden_dim,), jnp.float32),
    }


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _avg_pool_apply(params: Params, spec: TowerSpec, pooled: jnp.ndarray, *,
                    train: bool = False, dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    out = pooled
    if params:  # projection branch exists
        out = out @ params["proj_w"] + params["proj_b"]
        if train and spec.dropout > 0.0 and dropout_rng is not None:
            keep = 1.0 - spec.dropout
            mask = jax.random.bernoulli(dropout_rng, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0).astype(out.dtype)
        out = _layer_norm(
            out.astype(jnp.float32), params["ln_scale"], params["ln_bias"]
        )
    return l2_normalize(out.astype(jnp.float32))


TOWER_REGISTRY.add("avg_pool", (_avg_pool_init, _avg_pool_apply))


# ---------------------------------------------------------------------------
# Sequence towers (cnn / rnn / transformer) — consume (B, L, D) token
# embeddings + ids rather than a pooled vector; see seq_towers.py
# ---------------------------------------------------------------------------

from .seq_towers import (  # noqa: E402  (registration order matters)
    cnn_apply,
    cnn_init,
    is_sequence_arch,
    rnn_apply,
    rnn_init,
    transformer_apply,
    transformer_init,
)

TOWER_REGISTRY.add("cnn", (cnn_init, cnn_apply))
TOWER_REGISTRY.add("rnn", (rnn_init, rnn_apply))
TOWER_REGISTRY.add("transformer", (transformer_init, transformer_apply))


# ---------------------------------------------------------------------------
# Two-tower assembly
# ---------------------------------------------------------------------------

def spec_from_config(config: Dict[str, Any], vocab_size: int) -> TwoTowerSpec:
    """Build the full model spec from a training config dict."""
    from .embeddings import spec_from_config as embedding_spec_from_config

    embedding_cfg = config.get("embedding", {})
    encoder_cfg = config.get("encoder", {})
    emb_spec = embedding_spec_from_config(embedding_cfg, vocab_size)
    tower_spec = TowerSpec(
        arch=encoder_cfg.get("arch", "mean"),
        embedding_dim=emb_spec.embedding_dim,
        hidden_dim=int(encoder_cfg.get("hidden_dim", 128)),
        dropout=float(encoder_cfg.get("dropout", 0.1)),
        kernel_size=int(encoder_cfg.get("kernel_size", 3)),
        num_layers=int(encoder_cfg.get("num_layers", 2)),
        num_heads=int(encoder_cfg.get("num_heads", 4)),
        max_len=int(encoder_cfg.get("max_len",
                                    config.get("max_sequence_length", 128))),
    )
    dtype_name = str(config.get("precision", config.get("compute_dtype", "float32")))
    compute_dtype = jnp.bfloat16 if dtype_name in ("bf16", "bfloat16") else jnp.float32
    return TwoTowerSpec(
        embedding=emb_spec,
        tower=tower_spec,
        tied_weights=bool(encoder_cfg.get("tied_weights", False)),
        compute_dtype=compute_dtype,
    )


def init_two_tower(rng: jax.Array, spec: TwoTowerSpec) -> Params:
    """Initialise the full param pytree.

    Layout: ``{'embedding': {...}, 'query_tower': {...}[, 'document_tower']}``.
    The embedding table is a single shared sub-tree (reference behaviour);
    with tied weights the document tower aliases the query tower at apply time
    and owns no params.
    """
    emb_rng, q_rng, d_rng = jax.random.split(rng, 3)
    tower_init, _ = TOWER_REGISTRY.get(spec.tower.arch)
    params: Params = {
        "embedding": init_embedding(emb_rng, spec.embedding),
        "query_tower": tower_init(q_rng, spec.tower),
    }
    if not spec.tied_weights:
        params["document_tower"] = tower_init(d_rng, spec.tower)
    return params


def _tower_params(params: Params, spec: TwoTowerSpec, tower: str) -> Params:
    if tower == "query" or spec.tied_weights or "document_tower" not in params:
        return params["query_tower"]
    return params["document_tower"]


def encode(params: Params, spec: TwoTowerSpec, ids: jnp.ndarray, tower: str = "query", *,
           train: bool = False, dropout_rng: Optional[jax.Array] = None,
           embed_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Encode a batch of id sequences with one tower.

    Args:
        ids: (batch, seq_len) int32 token ids, PAD=0.
        tower: 'query' or 'document'.
        embed_fn: optional override for the embedding lookup with the same
            signature as ``embeddings.embed_ids`` — used by the parallel
            layer to swap in the row-sharded shard_map gather and by the
            kernels layer for the fused Pallas gather.

    Returns:
        (batch, output_dim) float32 unit vectors.
    """
    _, tower_apply = TOWER_REGISTRY.get(spec.tower.arch)
    if is_sequence_arch(spec.tower.arch):
        lookup = embed_fn if embed_fn is not None else embed_ids
        embedded = lookup(params["embedding"], spec.embedding, ids,
                          dtype=spec.compute_dtype)
        return tower_apply(
            _tower_params(params, spec, tower), spec.tower, embedded, ids,
            train=train, dropout_rng=dropout_rng,
        )
    lookup = embed_fn if embed_fn is not None else embed_ids
    embedded = lookup(params["embedding"], spec.embedding, ids,
                      dtype=spec.compute_dtype)
    pooled = masked_mean_pool(embedded, ids)
    return tower_apply(
        _tower_params(params, spec, tower), spec.tower, pooled,
        train=train, dropout_rng=dropout_rng,
    )


def forward(params: Params, spec: TwoTowerSpec, query_ids: jnp.ndarray,
            document_ids: Optional[jnp.ndarray] = None,
            negative_ids: Optional[jnp.ndarray] = None, *,
            train: bool = False, dropout_rng: Optional[jax.Array] = None):
    """Full forward pass; returns 1-3 vectors depending on provided inputs
    (reference TwoTower.forward, encoders.py:184-216)."""
    rngs = (None, None, None)
    if dropout_rng is not None:
        rngs = tuple(jax.random.split(dropout_rng, 3))
    q = encode(params, spec, query_ids, "query", train=train, dropout_rng=rngs[0])
    if document_ids is None:
        return q
    d = encode(params, spec, document_ids, "document", train=train, dropout_rng=rngs[1])
    if negative_ids is None:
        return q, d
    n = encode(params, spec, negative_ids, "document", train=train, dropout_rng=rngs[2])
    return q, d, n


def count_params(params: Params) -> int:
    """Total number of scalars in the param pytree."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
