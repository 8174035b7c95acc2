#!/usr/bin/env python
"""Headline benchmark: two-tower training throughput (pairs/sec) on one chip.

Runs the flagship training configuration (char two-tower: vocab 96, seq 64,
embed 64, hidden 128, tied towers, triplet loss — the reference's
char_tower.yml shape) as the fused jit train step in bf16 on whatever single
chip is visible, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}

vs_baseline divides by the reference implementation's measured throughput on
this host (tools/measure_reference_baseline.py drives the reference's own
PyTorch code: 6945.4 pairs/sec CPU — the reference has no TPU path; see
BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

REFERENCE_PAIRS_PER_SEC = 6945.4  # torch-CPU reference, same host (BASELINE.md)

VOCAB, SEQ, BATCH = 96, 64, 1024
WARMUP, STEPS = 5, 30


def main() -> int:
    import jax
    import jax.numpy as jnp

    from twotowers_tpu.models import (
        EmbeddingSpec,
        TowerSpec,
        TwoTowerSpec,
        build_loss,
        init_two_tower,
    )
    from twotowers_tpu.train import build_optimizer, create_train_state, make_train_step

    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=VOCAB, embedding_dim=64),
        tower=TowerSpec(arch="mean", embedding_dim=64, hidden_dim=128),
        tied_weights=True,
        compute_dtype=jnp.bfloat16,
    )
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    loss_def = build_loss("triplet", margin=0.2)
    optimizer = build_optimizer({"optimizer": {"type": "adamw", "lr": 1e-3}})
    step = make_train_step(spec, loss_def, optimizer)
    state = create_train_state(params, optimizer)

    rng = np.random.default_rng(0)
    batches = [
        tuple(
            jax.device_put(rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
            for _ in range(3)
        )
        for _ in range(4)
    ]
    weights = jax.device_put(np.ones(BATCH, np.float32))

    for i in range(WARMUP):
        q, p, n = batches[i % len(batches)]
        state, metrics = step(state, q, p, n, weights)
    jax.block_until_ready(metrics["loss"])

    start = time.perf_counter()
    for i in range(STEPS):
        q, p, n = batches[i % len(batches)]
        state, metrics = step(state, q, p, n, weights)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    pairs_per_sec = STEPS * BATCH / elapsed
    print(json.dumps({
        "metric": "train_throughput_char_tower_1chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
