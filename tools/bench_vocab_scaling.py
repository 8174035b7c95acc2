#!/usr/bin/env python
"""Training-step throughput across vocabulary sizes (VERDICT r2 item 2).

Every round-2 perf number used vocab 96 (the one-hot MXU path,
models/embeddings.py). The reference's word2vec/GloVe configs imply
10^4-10^5 vocabularies where the lookup is a gather and its autodiff
transpose is a scatter-add — the path measured as catastrophic for small
vocabs (collision serialisation). This bench measures the mean-tower train
step at vocab in {96, 8k, 32k, 100k} x {trainable, frozen} and writes
VOCAB_SCALING.json so any cliff is on the record (and fixed).

Ids are sampled zipf-like (s=1.07, the empirical token distribution shape)
so scatter collisions reflect real text, not the uniform best case.

Run: ``python tools/bench_vocab_scaling.py [batch] [seq]``
Relay-proof protocol: see bench.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from twotowers_tpu.models import (
    EmbeddingSpec, TowerSpec, TwoTowerSpec, build_loss, init_two_tower)
from twotowers_tpu.train import build_optimizer, create_train_state, make_train_step

CHAIN = 17
TRIALS = 3
POOL = 2


def zipf_ids(rng, vocab: int, shape) -> np.ndarray:
    """Zipf-ish token ids in [1, vocab): rank r gets mass ~ 1/(r+1)^1.07."""
    ranks = np.arange(1, vocab)
    weights = 1.0 / np.power(ranks, 1.07)
    weights /= weights.sum()
    return rng.choice(np.arange(1, vocab), size=shape, p=weights).astype(np.int32)


def bench_one(vocab: int, trainable: bool, batch: int, seq: int,
              emb: int = 64, hid: int = 128) -> dict:
    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=vocab,
                                embedding_dim=emb, trainable=trainable),
        tower=TowerSpec(arch="mean", embedding_dim=emb, hidden_dim=hid),
        tied_weights=True,
        compute_dtype=jnp.bfloat16,
    )
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    loss_def = build_loss("triplet", margin=0.2)
    optimizer = build_optimizer({"optimizer": {"type": "adamw", "lr": 1e-3}})
    step = make_train_step(spec, loss_def, optimizer)

    rng = np.random.default_rng(vocab)
    q, p, n = (jax.device_put(zipf_ids(rng, vocab, (POOL, batch, seq)))
               for _ in range(3))
    weights = jax.device_put(np.ones(batch, np.float32))

    def make_chained(iters: int):
        @jax.jit
        def run(state):
            def body(carry, i):
                st, acc = carry
                idx = jnp.mod(i, POOL)
                st, metrics = step(
                    st,
                    jax.lax.dynamic_index_in_dim(q, idx, keepdims=False),
                    jax.lax.dynamic_index_in_dim(p, idx, keepdims=False),
                    jax.lax.dynamic_index_in_dim(n, idx, keepdims=False),
                    weights)
                acc = acc + sum(jnp.asarray(v, jnp.float32).sum()
                                for v in metrics.values())
                return (st, acc), None
            (_, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), jnp.arange(iters))
            return acc
        return run

    one, many = make_chained(1), make_chained(CHAIN)

    def best(fn):
        out = float("inf")
        for _ in range(TRIALS):
            state = create_train_state(params, optimizer)
            float(fn(state))
            state = create_train_state(params, optimizer)
            t0 = time.perf_counter()
            float(fn(state))
            out = min(out, time.perf_counter() - t0)
        return out

    t1, tn = best(one), best(many)
    if tn <= t1:
        raise RuntimeError(f"noise-inverted measurement at vocab={vocab}")
    per = (tn - t1) / (CHAIN - 1)
    return {
        "vocab": vocab, "trainable": trainable,
        "pairs_per_sec": round(batch / per, 1),
        "step_time_ms": round(per * 1e3, 3),
    }


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    rows = []
    for vocab in (96, 8192, 32768, 102_400):
        for trainable in (True, False):
            row = bench_one(vocab, trainable, batch, seq)
            rows.append(row)
            print(f"vocab {vocab:7d} trainable={str(trainable):5s}: "
                  f"{row['pairs_per_sec']:12,.0f} pairs/s  "
                  f"{row['step_time_ms']:8.3f} ms/step")

    out = Path(__file__).resolve().parents[1] / "VOCAB_SCALING.json"
    out.write_text(json.dumps({
        "bench": "train_step_vocab_scaling",
        "batch": batch, "seq": seq, "emb": 64, "hid": 128,
        "tower": "mean", "loss": "triplet", "dtype": "bfloat16",
        "id_distribution": "zipf(1.07)",
        "device": str(jax.devices()[0]),
        "protocol": "relay-proof lax.scan chain, (T(N)-T(1))/(N-1), best of 3",
        "results": rows,
    }, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
