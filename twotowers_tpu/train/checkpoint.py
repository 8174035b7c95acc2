"""Checkpointing with real resume support.

Capability parity with /root/reference/twotower/utils.py:231-330 (timestamped
checkpoint + ``best_model`` copy carrying model, tokenizer vocab, optimizer
state, epoch, loss, timestamp) — but TPU-native: array state is written with
orbax (sharding-aware, multi-host safe, async-capable) instead of
``torch.save`` pickles, the tokenizer/config/counters travel as JSON, and —
unlike the reference, which can save but never wires a ``--resume`` flag —
``latest_checkpoint`` + ``load_checkpoint`` give the train loop true
crash-resume (SURVEY.md §5 checkpoint/resume gap).

Layout: ``<dir>/<name>/`` containing ``state/`` (orbax pytree of params +
optimizer state) and ``meta.json``; ``<dir>/best_model`` mirrors the best
epoch so retrieval/eval CLIs can always point at a stable path.
"""

from __future__ import annotations

import datetime
import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..utils.logging import get_logger

logger = get_logger("train.checkpoint")

BEST_NAME = "best_model"


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(
    state_tree: Any,
    checkpoint_dir: str,
    *,
    tokenizer_state: Optional[Dict[str, Any]] = None,
    config: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    step: int = 0,
    loss: float = float("inf"),
    checkpoint_name: Optional[str] = None,
    save_best: bool = True,
) -> str:
    """Save a pytree of arrays plus JSON sidecar metadata.

    ``state_tree`` is typically ``{"params": ..., "opt_state": ...}``.
    Returns the checkpoint directory path.
    """
    root = Path(checkpoint_dir).resolve()
    root.mkdir(parents=True, exist_ok=True)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    name = checkpoint_name or f"two_tower_{timestamp}_epoch{epoch}"
    ckpt_path = root / name
    if ckpt_path.exists():
        shutil.rmtree(ckpt_path)
    ckpt_path.mkdir(parents=True)

    ckptr = _checkpointer()
    ckptr.save(ckpt_path / "state", state_tree)
    ckptr.wait_until_finished()

    meta = {
        "epoch": int(epoch),
        "step": int(step),
        "loss": float(loss),
        "timestamp": timestamp,
        "tokenizer": tokenizer_state,
        "config": config,
    }
    with open(ckpt_path / "meta.json", "w") as f:
        json.dump(meta, f)
    logger.info("Saved checkpoint to %s", ckpt_path)

    if save_best:
        best_path = root / BEST_NAME
        if best_path.exists():
            shutil.rmtree(best_path)
        shutil.copytree(ckpt_path, best_path)
        logger.info("Saved best model to %s", best_path)
    return str(ckpt_path)


def load_metadata(checkpoint_path: str) -> Dict[str, Any]:
    with open(Path(checkpoint_path) / "meta.json") as f:
        return json.load(f)


def load_checkpoint(
    checkpoint_path: str, template_tree: Any
) -> Tuple[Any, Dict[str, Any]]:
    """Restore (state_tree, metadata).

    ``template_tree`` is a pytree with the target structure/shapes/shardings —
    typically a freshly initialised state; orbax restores arrays directly
    onto the template's shardings (device-resident, no host detour).
    """
    path = Path(checkpoint_path).resolve()
    ckptr = _checkpointer()

    def abstract_leaf(x):
        # orbax's to_shape_dtype_struct turns 0-d arrays into plain scalars,
        # dropping their sharding; a multi-process restore then lands e.g.
        # opt_state.count on ONE local device instead of replicated over the
        # mesh, and the next sharded train step fails with "incompatible
        # devices" (caught by tools/multiprocess_smoke.py). Keep the
        # template's sharding on every jax.Array leaf explicitly.
        if isinstance(x, jax.Array) and not jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return ocp.utils.to_shape_dtype_struct(x)

    abstract = jax.tree_util.tree_map(abstract_leaf, template_tree)
    state = ckptr.restore(path / "state", abstract)
    return state, load_metadata(path)


def load_trained_model(checkpoint_path: str):
    """Rebuild (params, spec, tokenizer, config) from a checkpoint directory.

    This is the inference-side loader the reference lacks: its retrieval CLI
    treats the stored ``state_dict`` as a live module and cannot actually run
    (/root/reference/inference/cli/retrieve.py:74, SURVEY.md §5). Here the
    sidecar metadata carries the config + tokenizer state, so the model is
    re-initialised and the saved arrays restored onto it.
    """
    from ..models.towers import init_two_tower, spec_from_config
    from ..tokenizers import tokenizer_from_state
    from .optim import build_optimizer

    meta = load_metadata(checkpoint_path)
    if not meta.get("tokenizer") or meta.get("config") is None:
        raise ValueError(
            f"Checkpoint {checkpoint_path} lacks tokenizer/config metadata"
        )
    tokenizer = tokenizer_from_state(meta["tokenizer"])
    config = meta["config"]
    spec = spec_from_config(config, vocab_size=tokenizer.vocab_size)

    import jax as _jax

    params = init_two_tower(_jax.random.PRNGKey(0), spec)
    optimizer = build_optimizer(config)
    template = {"params": params, "opt_state": optimizer.init(params)}
    state, _ = load_checkpoint(checkpoint_path, template)
    return state["params"], spec, tokenizer, config


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Most recent checkpoint directory (by name timestamp), if any."""
    root = Path(checkpoint_dir)
    if not root.exists():
        return None
    candidates = sorted(
        p for p in root.iterdir()
        if p.is_dir() and p.name != BEST_NAME and (p / "meta.json").exists()
    )
    return str(candidates[-1]) if candidates else None
