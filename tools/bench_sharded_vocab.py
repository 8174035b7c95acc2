#!/usr/bin/env python
"""Measure the sharded-vocabulary regime on the real chip (VERDICT r4 #4).

BASELINE.md routes >VMEM vocabularies (102,400: 57 ms/step trainable) to
mesh row-sharding (parallel/embedding_shard.py), arguing each shard
"re-enters the <=VMEM regime". This makes that claim a measurement: on the
ONE available chip, time (a) the isolated gather+scatter fwd+bwd and (b) the
FULL word train step at exactly the per-shard table sizes a 102,400 vocab
yields on 2/4/8 chips (51,200 / 25,600 / 12,800 rows x 64).

Faithfulness: under shard_map each chip gathers/scatters the FULL global
batch against its local rows (clamped ids + ownership mask,
embedding_shard._local_gather) — so a 1-chip run at vocab=rows_per_shard is
the per-chip compute, exactly. What it excludes is the psum of the (B, L, D)
activations over the model axis; that cost is pure ICI bytes and is reported
analytically per step alongside the measurement (ring all-reduce moves
2(S-1)/S x bytes; v5e ICI ~180-400 GB/s effective per chip depending on
torus dimension use), so the projected N-chip step = measured per-chip step
+ the stated ICI bound.

Writes a "sharded_projection" section into VOCAB_SCALING.json and prints
the table for BASELINE.md.

Run: python tools/bench_sharded_vocab.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_vocab_scaling import bench_one, zipf_ids

CHAIN = 9
TRIALS = 3

FULL_VOCAB = 102_400
BATCH, SEQ, DIM = 16384, 64, 64
N_ROWS = 3 * BATCH * SEQ  # triplet loss: 3 encoded texts per step


def _measure(fn, *args, chain=CHAIN):
    """Relay-proof per-call time (salted-scan protocol, see exp_seg_backward)."""

    def make(iters):
        @jax.jit
        def run(table, ids):
            def body(acc, i):
                salt = (acc * 1e-30).astype(ids.dtype)
                out = fn(table, ids + salt)
                return acc + out * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return acc
        return run

    one, many = make(1), make(chain)
    best = {}
    for name, f in (("one", one), ("many", many)):
        out = float("inf")
        float(f(*args))
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(f(*args))
            out = min(out, time.perf_counter() - t0)
        best[name] = out
    if best["many"] <= best["one"]:
        raise RuntimeError(f"noise-inverted: {best}")
    return (best["many"] - best["one"]) / (chain - 1)


def bench_local_gather_grad(rows: int, ids: np.ndarray) -> float:
    """fwd+bwd of the per-shard masked gather (shard 0 of FULL_VOCAB/rows).

    Mirrors embedding_shard._local_gather: clamp ids into the local range,
    gather via take_fast_grad (Pallas scatter-add backward when the (rows, D)
    f32 accumulator fits VMEM), mask unowned rows. Loss is quadratic so the
    cotangent is input-dependent (a linear loss's constant gradient would
    hoist out of the timing scan — memory rule 1)."""
    from twotowers_tpu.kernels.pallas_scatter_add import take_fast_grad

    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((rows, DIM)), jnp.float32)
    ids_d = jax.device_put(ids)

    def loss(t, i):
        local = jnp.clip(i, 0, rows - 1)
        owned = (i >= 0) & (i < rows)
        g = take_fast_grad(t, local, jnp.bfloat16)
        g = jnp.where(owned[..., None], g, 0.0)
        return jnp.sum(jnp.square(g.astype(jnp.float32)))

    grad_fn = jax.grad(loss)

    def timed(t, i):
        out = grad_fn(t, i)
        return out.astype(jnp.float32).sum()

    return _measure(timed, table, ids_d)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # global zipf ids over the FULL vocabulary, then viewed from shard 0 —
    # the worst shard under contiguous row-sharding (it owns the zipf head,
    # so nearly every id is owned: upper-bound RMW load)
    global_ids = zipf_ids(rng, FULL_VOCAB, (BATCH, SEQ))

    shard_counts = (2, 4) if args.quick else (2, 4, 8)
    results = {"isolated_gather_grad": [], "train_step": []}

    for shards in shard_counts:
        rows = FULL_VOCAB // shards
        ms = bench_local_gather_grad(rows, global_ids) * 1e3
        owned = float(np.mean(global_ids < rows))
        results["isolated_gather_grad"].append({
            "shards": shards, "rows_per_shard": rows,
            "ms_per_call": round(ms, 2), "owned_id_fraction": round(owned, 4),
        })
        print(f"[gather+grad] {shards}-way shard ({rows} rows): {ms:.2f} ms "
              f"({owned:.1%} ids owned)", flush=True)
        time.sleep(2)

    for shards in shard_counts:
        rows = FULL_VOCAB // shards
        row = bench_one(rows, True, BATCH, SEQ)
        # ICI cost of the 3 activation psums (bf16), ring all-reduce
        bytes_psum = 3 * BATCH * SEQ * DIM * 2 * 2 * (shards - 1) / shards
        ici_ms = {
            "at_180GBps": round(bytes_psum / 180e9 * 1e3, 2),
            "at_400GBps": round(bytes_psum / 400e9 * 1e3, 2),
        }
        projected = {
            band: round(row["step_time_ms"] + ms, 2)
            for band, ms in ici_ms.items()
        }
        results["train_step"].append({
            "shards": shards, "rows_per_shard": rows,
            "per_chip_step_ms": row["step_time_ms"],
            "pairs_per_sec_per_chip": row["pairs_per_sec"],
            "psum_bytes_per_step": int(bytes_psum),
            "ici_ms": ici_ms,
            "projected_sharded_step_ms": projected,
        })
        print(f"[train step]  {shards}-way shard ({rows} rows): "
              f"{row['step_time_ms']:.2f} ms/chip + ICI "
              f"{ici_ms['at_180GBps']}-{ici_ms['at_400GBps']} ms "
              f"-> projected {projected['at_180GBps']} ms", flush=True)
        time.sleep(2)

    out = Path(__file__).resolve().parents[1] / "VOCAB_SCALING.json"
    record = json.loads(out.read_text()) if out.exists() else {}
    record["sharded_projection"] = {
        "full_vocab": FULL_VOCAB, "batch": BATCH, "seq": SEQ, "dim": DIM,
        "protocol": "per-chip compute measured at vocab=rows_per_shard on 1 "
                    "chip (exact per embedding_shard._local_gather); psum "
                    "cost analytic (bytes / stated ICI bandwidth range)",
        "results": results,
    }
    out.write_text(json.dumps(record, indent=2) + "\n")
    print(f"wrote sharded_projection into {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
