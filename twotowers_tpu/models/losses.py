"""Contrastive training objectives on (query, document) unit vectors.

Numeric parity with /root/reference/twotower/losses.py (triplet hinge,
multiple-negatives InfoNCE, in-batch sampled softmax), redesigned TPU-first:

* **Arity is first-class.** The reference's trainer can only ever call the
  3-arg triplet loss (train.py:133) even though 2-arg losses sit in its
  registry (a latent bug noted in SURVEY.md §5). Here every loss declares
  which batch fields it consumes, and the train step assembles accordingly.
* **Padded final batches.** TPU jit wants a fixed batch size, so the last
  batch of an epoch is padded; every loss takes per-sample ``weights`` and
  computes a weighted mean, keeping epoch-mean losses identical to the
  reference's variable-batch means. Pad rows are additionally masked out of
  the in-batch negative pool.
* A cross-replica **global-negatives** variant of the in-batch loss lives in
  ``parallel/collectives.py`` (all-gathered document pool).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from jax.nn import log_softmax

from ..ops.core import cosine_similarity
from ..utils.registry import Registry

LOSS_REGISTRY = Registry("loss")

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class LossDef:
    """A loss function plus the batch arity it consumes.

    arity:
        'triplet'   -> fn(q, pos, neg, weights)        with (B, D) vectors
        'pair'      -> fn(q, docs, weights)            with (B, D) vectors
        'multi_neg' -> fn(q, pos, negs, weights)       negs is (B, N, D)
    """

    fn: Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
    arity: str


def _weighted_mean(values: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is None:
        return jnp.mean(values)
    weights = weights.astype(values.dtype)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def contrastive_triplet_loss(
    q: jnp.ndarray, pos: jnp.ndarray, neg: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None, margin: float = 0.2,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Hinge triplet loss: mean(relu(margin - cos(q,pos) + cos(q,neg))).

    Reference: losses.py:9-44. Also returns the pos/neg similarity monitors
    the reference computes in its hot loop (train.py:144-151) so the train
    step needs no second forward pass.
    """
    sim_pos = cosine_similarity(q, pos)
    sim_neg = cosine_similarity(q, neg)
    per_sample = jnp.maximum(margin - sim_pos + sim_neg, 0.0)
    loss = _weighted_mean(per_sample, weights)
    aux = {
        "pos_similarity": _weighted_mean(sim_pos, weights),
        "neg_similarity": _weighted_mean(sim_neg, weights),
    }
    return loss, aux


def multiple_negatives_loss(
    q: jnp.ndarray, pos: jnp.ndarray, negs: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None, temperature: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """InfoNCE over 1 positive + N explicit negatives per query.

    Reference: losses.py:47-85. ``negs`` is (B, N, D); the positive sits at
    logit index 0 and cross-entropy targets index 0.
    """
    candidates = jnp.concatenate([pos[:, None, :], negs], axis=1)  # (B, N+1, D)
    sims = cosine_similarity(q[:, None, :], candidates, axis=-1)  # (B, N+1)
    logits = sims / temperature
    per_sample = -log_softmax(logits, axis=-1)[:, 0]
    loss = _weighted_mean(per_sample, weights)
    aux = {
        "pos_similarity": _weighted_mean(sims[:, 0], weights),
        "neg_similarity": _weighted_mean(jnp.mean(sims[:, 1:], axis=-1), weights),
    }
    return loss, aux


def in_batch_sampled_softmax_loss(
    q: jnp.ndarray, docs: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None, temperature: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """In-batch softmax: every other document in the batch is a negative.

    Reference: losses.py:88-118 — raw dot-product logits (vectors are already
    unit-norm from the towers), diagonal labels. Pad rows (weight 0) are
    masked out of the candidate pool so they never act as negatives.
    """
    batch = q.shape[0]
    logits = (q @ docs.T) / temperature  # (B, B)
    if weights is not None:
        col_mask = weights.astype(jnp.bool_)[None, :]
        eye = jnp.eye(batch, dtype=jnp.bool_)
        logits = jnp.where(col_mask | eye, logits, NEG_INF)
    diag = jnp.arange(batch)
    per_sample = -log_softmax(logits, axis=-1)[diag, diag]
    loss = _weighted_mean(per_sample, weights)
    sims = cosine_similarity(q, docs)
    off_diag_sum = q @ docs.T
    if weights is not None:
        off_diag_sum = off_diag_sum * weights[None, :]
        denom = jnp.maximum(jnp.sum(weights) - 1.0, 1.0)
    else:
        denom = jnp.asarray(max(batch - 1, 1), q.dtype)
    neg_mean = (jnp.sum(off_diag_sum, axis=1) - jnp.diag(q @ docs.T)) / denom
    aux = {
        "pos_similarity": _weighted_mean(sims, weights),
        "neg_similarity": _weighted_mean(neg_mean, weights),
    }
    return loss, aux


def cosine_embedding_loss(
    q: jnp.ndarray, pos: jnp.ndarray, neg: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None, margin: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Cosine embedding loss over the triplet (torch CosineEmbeddingLoss
    semantics applied to both legs): pull ``1 - cos(q, pos)`` to zero, push
    ``relu(cos(q, neg) - margin)`` to zero.

    The reference's config docs advertise ``loss: type: "cosine"``
    (/root/reference/artifacts/docs/config.md:90) but its registry
    (losses.py:122-127) never implements it; provided here for real.
    """
    sim_pos = cosine_similarity(q, pos)
    sim_neg = cosine_similarity(q, neg)
    per_sample = (1.0 - sim_pos) + jnp.maximum(sim_neg - margin, 0.0)
    loss = _weighted_mean(per_sample, weights)
    aux = {
        "pos_similarity": _weighted_mean(sim_pos, weights),
        "neg_similarity": _weighted_mean(sim_neg, weights),
    }
    return loss, aux


LOSS_REGISTRY.add("triplet", LossDef(contrastive_triplet_loss, "triplet"))
LOSS_REGISTRY.add("multiple_negatives", LossDef(multiple_negatives_loss, "multi_neg"))
LOSS_REGISTRY.add("in_batch", LossDef(in_batch_sampled_softmax_loss, "pair"))
LOSS_REGISTRY.add("cosine", LossDef(cosine_embedding_loss, "triplet"))
# the docs' "contrastive" (config.md:90) is the hinge triplet — the reference
# even names it contrastive_triplet_loss (losses.py:9)
LOSS_REGISTRY.add("contrastive", LossDef(contrastive_triplet_loss, "triplet"))


def build_loss(name: str, **kwargs: Any) -> LossDef:
    """Look up a loss and bind config kwargs (margin/temperature/...)."""
    base = LOSS_REGISTRY.get(name)
    if kwargs:
        return LossDef(functools.partial(base.fn, **kwargs), base.arity)
    return base


# reference-layout alias (twotower.losses.build) for migrated call sites
build = build_loss
