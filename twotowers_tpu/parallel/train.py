"""Sharded training: pjit train step over the ('data','model') mesh.

Composition of the parallel substrate (SURVEY.md §2.4 TPU-native column):
batch axes sharded over 'data' (GSPMD inserts the gradient all-reduce for
replicated tower params automatically), the vocabulary embedding table
row-sharded over 'model' via the shard_map gather+psum lookup, and — for the
'pair' (in-batch) loss — cross-replica global negatives via all_gather.
Triplet / multi-negative losses are per-sample, so plain DP sharding of
their weighted mean is already exact.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.losses import LossDef
from ..models.towers import TwoTowerSpec, encode
from ..train.step import TrainState, mask_frozen_updates
from ..utils.logging import get_logger
from .collectives import global_in_batch_loss
from .embedding_shard import sharded_embed_ids
from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding import batch_sharding, pad_batch_to_multiple, shard_params

logger = get_logger("parallel.train")


def _loss_kwarg(loss_def: LossDef, name: str, default: float) -> float:
    fn = loss_def.fn
    kw = getattr(fn, "keywords", None)
    if kw and name in kw:
        return float(kw[name])
    return default


def make_sharded_embed_fn(mesh: Mesh) -> Callable:
    """An ``embed_ids``-compatible lookup backed by the shard_map gather."""

    def embed_fn(emb_params, emb_spec, ids, dtype=jnp.float32):
        table = emb_params["table"]
        if not emb_spec.trainable:
            table = jax.lax.stop_gradient(table)
        return sharded_embed_ids(table, ids, mesh, dtype=dtype)

    return embed_fn


def make_sharded_train_step(
    spec: TwoTowerSpec,
    loss_def: LossDef,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    shard_vocab: bool = True,
    global_negatives: bool = True,
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pjit train step for a mesh. Same signature as the
    single-device step (train/step.py) so the loop is sharding-agnostic."""
    model_size = mesh.shape[MODEL_AXIS]
    data_size = mesh.shape[DATA_AXIS]
    use_sharded_embed = shard_vocab and model_size > 1
    use_global_negs = (
        global_negatives and loss_def.arity == "pair" and data_size > 1
    )
    embed_fn = make_sharded_embed_fn(mesh) if use_sharded_embed else None
    temperature = _loss_kwarg(loss_def, "temperature", 0.1)

    def encode_with(params, ids, tower, rng):
        return encode(params, spec, ids, tower, train=True, dropout_rng=rng,
                      embed_fn=embed_fn)

    def step_fn(state: TrainState, queries, positives, negatives, weights):
        rng, dropout_rng = jax.random.split(state.rng)
        rngs = jax.random.split(dropout_rng, 3)

        def loss_of(params):
            q = encode_with(params, queries, "query", rngs[0])
            p = encode_with(params, positives, "document", rngs[1])
            if loss_def.arity == "pair":
                if use_global_negs:
                    return global_in_batch_loss(q, p, weights, mesh, temperature)
                return loss_def.fn(q, p, weights)
            if loss_def.arity == "multi_neg":
                b, num_negs, seq = negatives.shape
                n = encode_with(params, negatives.reshape(b * num_negs, seq),
                                "document", rngs[2]).reshape(b, num_negs, -1)
                return loss_def.fn(q, p, n, weights)
            n = encode_with(params, negatives, "document", rngs[2])
            return loss_def.fn(q, p, n, weights)

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
        return TrainState(params, opt_state, state.step + 1, rng), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_sharded_eval_step(
    spec: TwoTowerSpec,
    loss_def: LossDef,
    mesh: Mesh,
    *,
    shard_vocab: bool = True,
    global_negatives: bool = True,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Build the pjit eval step (no grad, no dropout) for a mesh.

    Mirrors ``make_sharded_train_step``'s encode path — the same row-sharded
    vocabulary gather and, for pair losses, the same global-negative
    all_gather — so validation under ``mesh:`` configs uses exactly the loss
    the train step optimises and works multi-process (the unsharded eval step
    cannot: it would consume globally-addressed arrays every process must
    fully own).
    """
    model_size = mesh.shape[MODEL_AXIS]
    data_size = mesh.shape[DATA_AXIS]
    use_sharded_embed = shard_vocab and model_size > 1
    use_global_negs = (
        global_negatives and loss_def.arity == "pair" and data_size > 1
    )
    embed_fn = make_sharded_embed_fn(mesh) if use_sharded_embed else None
    temperature = _loss_kwarg(loss_def, "temperature", 0.1)

    def eval_fn(params, queries, positives, negatives, weights):
        def enc(ids, tower):
            return encode(params, spec, ids, tower, train=False,
                          dropout_rng=None, embed_fn=embed_fn)

        q = enc(queries, "query")
        p = enc(positives, "document")
        if loss_def.arity == "pair":
            if use_global_negs:
                loss, aux = global_in_batch_loss(q, p, weights, mesh, temperature)
            else:
                loss, aux = loss_def.fn(q, p, weights)
        elif loss_def.arity == "multi_neg":
            b, num_negs, seq = negatives.shape
            n = enc(negatives.reshape(b * num_negs, seq),
                    "document").reshape(b, num_negs, -1)
            loss, aux = loss_def.fn(q, p, n, weights)
        else:
            n = enc(negatives, "document")
            loss, aux = loss_def.fn(q, p, n, weights)
        return {
            "loss": loss,
            "pos_similarity": aux["pos_similarity"],
            "neg_similarity": aux["neg_similarity"],
            "similarity_diff": aux["pos_similarity"] - aux["neg_similarity"],
        }

    return jax.jit(eval_fn)


def create_sharded_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    shard_vocab: bool = True,
    rng: Optional[jax.Array] = None,
) -> TrainState:
    """Place params on the mesh and init optimizer state with matching
    shardings (optax init is zeros/ones-like, so GSPMD propagates the param
    shardings through a jitted init)."""
    import numpy as np
    from jax.sharding import NamedSharding

    params = shard_params(params, mesh, shard_vocab)
    opt_state = jax.jit(optimizer.init)(params)

    # jit constant-folds input-independent leaves (optax's step `count`) and
    # commits them to the process-local default device as host-local arrays.
    # Multi-host that is poison: orbax refuses to serialize them and a
    # restored state fails the sharded step with "incompatible devices"
    # (caught by tools/multiprocess_smoke.py). Rebuild any leaf that does not
    # span the mesh as a fully-replicated global array.
    mesh_devices = set(mesh.devices.flat)

    def globalize(leaf):
        if (not isinstance(leaf, jax.Array)
                or set(leaf.sharding.device_set) == mesh_devices):
            return leaf
        value = np.asarray(leaf)  # host-local; identical on every process
        return jax.make_array_from_callback(
            leaf.shape, NamedSharding(mesh, P()), lambda idx: value[idx])

    opt_state = jax.tree_util.tree_map(globalize, opt_state)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
    )


def _place_per_process(padded, sharding) -> jax.Array:
    """Assemble a global array from per-device shards of the local rows.

    Multi-host contract (SURVEY.md §2.4 per-host data loading): every process
    iterates the SAME seeded global batch stream, and each process places only
    the rows its addressable devices own — no process ever device_puts rows
    for a device it cannot address, which is what makes the plain
    ``jax.device_put(global, sharding)`` path single-process-only.
    ``padded`` here is the *global* batch (identical on every process by
    seeding); the per-device index map selects this process's rows.
    """
    global_shape = padded.shape
    device_arrays = [
        jax.device_put(padded[idx], device)
        for device, idx in sharding.addressable_devices_indices_map(
            global_shape).items()
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, device_arrays)


def shard_batch(mesh: Mesh, *arrays, per_process: Optional[bool] = None):
    """Pad leading axes to the data-axis size and place on the mesh.

    ``per_process=None`` auto-selects: the single ``device_put`` of the
    global batch when one process addresses the whole mesh (cheapest), the
    per-device assembly otherwise (required on multi-host, where each
    process may only transfer to its local devices).
    """
    if per_process is None:
        per_process = jax.process_count() > 1
    data_size = mesh.shape[DATA_AXIS]
    out = []
    for array in arrays:
        if array is None:
            out.append(None)
            continue
        padded = pad_batch_to_multiple(array, data_size)
        sharding = batch_sharding(mesh, padded.ndim)
        if per_process:
            out.append(_place_per_process(padded, sharding))
        else:
            out.append(jax.device_put(padded, sharding))
    return tuple(out)
