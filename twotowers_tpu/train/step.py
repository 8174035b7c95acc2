"""The jit-compiled training and evaluation steps.

This replaces the reference's eager per-batch hot loop
(/root/reference/twotower/train.py:103-197) with a single fused XLA program:
forward (both towers), loss, backward, optimizer update, similarity monitors
and the global grad-norm all execute on-device in one launch, with param and
optimizer buffers donated so the update is in-place in HBM. The monitors the
reference computes with a second no-grad forward (train.py:144-151) and a
host-side parameter walk (train.py:185-191) fall out of the same pass here
for free.

Loss arity (triplet / pair / multi_neg) decides which encodings are taken,
fixing the reference bug where only the 3-arg triplet loss was reachable
from the trainer (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.losses import LossDef
from ..models.towers import TwoTowerSpec, encode


class TrainState(NamedTuple):
    """Carried training state: params, optimizer state, step counter, rng."""

    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def create_train_state(
    params: Any, optimizer: optax.GradientTransformation, rng: Optional[jax.Array] = None
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
    )


def _encode_for_loss(
    params: Any,
    spec: TwoTowerSpec,
    loss_def: LossDef,
    queries: jnp.ndarray,
    positives: jnp.ndarray,
    negatives: Optional[jnp.ndarray],
    weights: jnp.ndarray,
    *,
    train: bool,
    dropout_rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    rngs = (None, None, None)
    if dropout_rng is not None:
        rngs = tuple(jax.random.split(dropout_rng, 3))
    q = encode(params, spec, queries, "query", train=train, dropout_rng=rngs[0])
    p = encode(params, spec, positives, "document", train=train, dropout_rng=rngs[1])

    if loss_def.arity == "pair":
        return loss_def.fn(q, p, weights)
    if negatives is None:
        raise ValueError(f"Loss arity {loss_def.arity!r} requires negatives in the batch")
    if loss_def.arity == "multi_neg":
        batch, num_negs, seq = negatives.shape
        flat = negatives.reshape(batch * num_negs, seq)
        n = encode(params, spec, flat, "document", train=train, dropout_rng=rngs[2])
        n = n.reshape(batch, num_negs, -1)
        return loss_def.fn(q, p, n, weights)
    # triplet
    n = encode(params, spec, negatives, "document", train=train, dropout_rng=rngs[2])
    return loss_def.fn(q, p, n, weights)


def mask_frozen_updates(updates: Any, spec: TwoTowerSpec) -> Any:
    """Zero optimizer updates for frozen params.

    stop_gradient makes frozen-table grads zero, but decoupled weight decay
    (AdamW) would still shrink the table every step; the reference freezes
    by keeping params out of the optimizer (requires_grad=False), so a
    frozen table must receive no update of any kind.
    """
    if spec.embedding.trainable:
        return updates
    updates = dict(updates)
    updates["embedding"] = jax.tree_util.tree_map(
        jnp.zeros_like, updates["embedding"]
    )
    return updates


def make_train_step(
    spec: TwoTowerSpec,
    loss_def: LossDef,
    optimizer: optax.GradientTransformation,
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step: (state, q, p, n, w) -> (state, metrics).

    State buffers are donated; metrics contains ``loss``, ``pos_similarity``,
    ``neg_similarity``, ``similarity_diff`` and ``grad_norm`` (all scalars).
    """

    def step_fn(state: TrainState, queries, positives, negatives, weights):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_of(params):
            return _encode_for_loss(
                params, spec, loss_def, queries, positives, negatives, weights,
                train=True, dropout_rng=dropout_rng,
            )

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        updates = mask_frozen_updates(updates, spec)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "pos_similarity": aux["pos_similarity"],
            "neg_similarity": aux["neg_similarity"],
            "similarity_diff": aux["pos_similarity"] - aux["neg_similarity"],
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(
    spec: TwoTowerSpec, loss_def: LossDef
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Build the jitted eval step: (params, q, p, n, w) -> metrics (no grad,
    no dropout), mirroring the reference's ``evaluate`` (train.py:222-296)."""

    def eval_fn(params, queries, positives, negatives, weights):
        loss, aux = _encode_for_loss(
            params, spec, loss_def, queries, positives, negatives, weights,
            train=False, dropout_rng=None,
        )
        return {
            "loss": loss,
            "pos_similarity": aux["pos_similarity"],
            "neg_similarity": aux["neg_similarity"],
            "similarity_diff": aux["pos_similarity"] - aux["neg_similarity"],
        }

    return jax.jit(eval_fn)
