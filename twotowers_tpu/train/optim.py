"""Optimizer construction from the ``optimizer:`` config section.

Parity with /root/reference/twotower/train.py:354-369 (adamw default, adam,
sgd+momentum), built on optax. torch AdamW defaults differ from optax's in
eps placement only through hyperparameters, so we pin torch's defaults
(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01) for numeric comparability.
"""

from __future__ import annotations

from typing import Any, Dict

import optax

from ..utils.logging import get_logger

logger = get_logger("train.optim")

DEFAULT_LEARNING_RATE = 1e-3


def build_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    """Build an optax optimizer from a config dict (``type``, ``lr``, ...)."""
    opt_config = config.get("optimizer", {}) or {}
    kind = str(opt_config.get("type", "adamw")).lower()
    lr = float(opt_config.get("lr", config.get("learning_rate", DEFAULT_LEARNING_RATE)))

    if kind == "adam":
        tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif kind == "sgd":
        tx = optax.sgd(lr, momentum=float(opt_config.get("momentum", 0.9)))
    else:
        if kind != "adamw":
            # reference silently falls back to AdamW for unknown types
            logger.warning("Unknown optimizer type %r; falling back to adamw", kind)
        tx = optax.adamw(
            lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=float(opt_config.get("weight_decay", 0.01)),
        )

    max_norm = opt_config.get("grad_clip_norm")
    if max_norm:
        tx = optax.chain(optax.clip_by_global_norm(float(max_norm)), tx)
    return tx
