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

Timing methodology (same relay-proof protocol as tools/bench_topk.py): the
chip sits behind a relay where ``block_until_ready`` acks without waiting for
execution and every array readback costs one ~26 ms round-trip, so per-step
wall timing measures dispatch rate, not device throughput. Instead each
measurement chains N train steps inside ONE ``lax.scan`` whose carry is the
full train state — step i+1's update data-depends on every element of step
i's params and optimizer state, so nothing can be skipped or overlapped — and
reads back a single scalar derived from the final loss. Per-step device time
is (T(N) - T(1)) / (N - 1), best of 3 trials.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

REFERENCE_PAIRS_PER_SEC = 6945.4  # torch-CPU reference, same host (BASELINE.md)

VOCAB, SEQ, BATCH = 96, 64, 16384
CHAIN = 33  # steps chained per measurement scan
TRIALS = 3


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

    rng = np.random.default_rng(0)
    q, p, n = (
        jax.device_put(rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
        for _ in range(3)
    )
    weights = jax.device_put(np.ones(BATCH, np.float32))

    def make_chained(iters: int):
        @jax.jit
        def run(state):
            def body(st, _):
                st, metrics = step(st, q, p, n, weights)
                return st, metrics["loss"]
            final, losses = jax.lax.scan(body, state, None, length=iters)
            # single-scalar readback that data-depends on the whole chain
            return losses[-1]
        return run

    one = make_chained(1)
    many = make_chained(CHAIN)

    def best(fn):
        out = float("inf")
        for _ in range(TRIALS):
            state = create_train_state(params, optimizer)
            float(fn(state))  # warm cache / compile on first trial
            t0 = time.perf_counter()
            float(fn(state))  # scalar readback = real completion
            out = min(out, time.perf_counter() - t0)
        return out

    t1, tn = best(one), best(many)
    per_step = max(tn - t1, 1e-9) / (CHAIN - 1)

    pairs_per_sec = BATCH / per_step
    print(json.dumps({
        "metric": "train_throughput_char_tower_1chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
