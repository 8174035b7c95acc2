#!/usr/bin/env python
"""Attribute the transformer tower's train-step time (VERDICT r3 item 2).

The bench shape (vocab 8192, seq 48, emb 128, hid 128, L2, heads 4,
batch 4096, in_batch loss) runs at 72.5 ms/step = 7.3% MFU while the char
tower hits ~70%. This tool measures each component's fwd+bwd time in
isolation with the relay-proof chained-scan protocol, so the 72 ms can be
attributed before optimizing:

  full_step        the exact bench train step (baseline)
  grad_only        value_and_grad without the optimizer update
  embed_fwd_bwd    embedding lookup + its scatter-add backward only
  tower_fwd_bwd    transformer_apply fwd+bwd on fixed (B,L,D) input
  attn_fwd_bwd     the two _mha calls' share (tower with 0 FFN? measured
                   directly on (B,L,H) input)
  ffn_fwd_bwd      one GELU FFN block fwd+bwd
  loss_fwd_bwd     in_batch loss fwd+bwd on fixed unit (B,H) embeddings

Optionally writes a jax.profiler trace (--trace_dir) for the record.

Run: python tools/profile_transformer.py [--trace_dir /tmp/tf_trace]
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

VOCAB, SEQ, BATCH, EMB, HID, LAYERS, HEADS = 8192, 48, 4096, 128, 128, 2, 4
CHAIN = 17
TRIALS = 3


def _measure(fn, *args):
    """fn(salt, *args) -> pytree; salt is a carry-derived f32 scalar (~0 at
    runtime, data-dependent at compile time) that each probe must fold into
    its inputs so XLA cannot hoist the loop-invariant call out of the scan."""
    def make(iters):
        @jax.jit
        def run(*xs):
            def body(acc, i):
                out = fn(acc * 1e-30, *xs)
                leaves = jax.tree_util.tree_leaves(out)
                acc2 = acc + sum(l.astype(jnp.float32).sum() * 1e-30
                                 for l in leaves)
                return acc2, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return acc
        return run

    one, many = make(1), make(CHAIN)
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
    return (best["many"] - best["one"]) / (CHAIN - 1)


def build():
    from twotowers_tpu.models import (
        EmbeddingSpec, TowerSpec, TwoTowerSpec, build_loss, init_two_tower)
    from twotowers_tpu.train import (
        build_optimizer, create_train_state, make_train_step)

    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=VOCAB,
                                embedding_dim=EMB),
        tower=TowerSpec(arch="transformer", embedding_dim=EMB, hidden_dim=HID,
                        num_layers=LAYERS, num_heads=HEADS, max_len=SEQ,
                        dropout=0.0),
        tied_weights=True,
        compute_dtype=jnp.bfloat16,
    )
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    loss_def = build_loss("in_batch", temperature=0.1)
    optimizer = build_optimizer({"optimizer": {"type": "adamw", "lr": 1e-3}})
    step = make_train_step(spec, loss_def, optimizer)
    state = create_train_state(params, optimizer)
    return spec, params, loss_def, optimizer, step, state


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace_dir", default=None)
    parser.add_argument("--phase2", action="store_true")
    args = parser.parse_args()
    if args.phase2:
        return phase2()

    from twotowers_tpu.models.losses import in_batch_sampled_softmax_loss
    from twotowers_tpu.models.seq_towers import _mha, transformer_apply
    from twotowers_tpu.models.embeddings import embed_ids

    spec, params, loss_def, optimizer, step, state = build()
    rng = np.random.default_rng(0)
    ids = jax.device_put(
        rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
    ids2 = jax.device_put(
        rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
    weights = jax.device_put(np.ones(BATCH, np.float32))
    embedded = jax.device_put(rng.standard_normal(
        (BATCH, SEQ, EMB)).astype(np.float32).astype(jnp.bfloat16))
    qp = rng.standard_normal((BATCH, HID)).astype(np.float32)
    qp /= np.linalg.norm(qp, axis=1, keepdims=True)
    q_emb = jax.device_put(qp)
    p_emb = jax.device_put(np.roll(qp, 1, axis=0))

    results = {}

    def record(name, fn, *xs):
        try:
            per = _measure(fn, *xs)
            results[name] = round(per * 1e3, 3)
        except Exception as exc:
            results[name] = f"{type(exc).__name__}: {exc}"
        print(f"{name}: {results[name]} ms", file=sys.stderr, flush=True)

    # baseline: the exact bench step
    record("full_step",
           lambda salt, s: step(s, ids + salt.astype(jnp.int32),
                                ids2 + salt.astype(jnp.int32), None,
                                weights)[1]["loss"],
           state)

    # gradient without optimizer update
    def grad_only(salt, p):
        from twotowers_tpu.models.towers import encode

        def loss_of(pp):
            q = encode(pp, spec, ids + salt.astype(jnp.int32), "query",
                       train=True, dropout_rng=jax.random.PRNGKey(1))
            d = encode(pp, spec, ids2 + salt.astype(jnp.int32), "document",
                       train=True, dropout_rng=jax.random.PRNGKey(2))
            return loss_def.fn(q, d, weights)[0]
        return jax.grad(loss_of)(p)
    record("grad_only", grad_only, params)

    # embedding fwd+bwd alone (2 texts' worth of lookups, like the step)
    def embed_fwd_bwd(salt, p):
        def loss_of(tab):
            e1 = embed_ids({"table": tab}, spec.embedding,
                           ids + salt.astype(jnp.int32), dtype=jnp.bfloat16)
            e2 = embed_ids({"table": tab}, spec.embedding,
                           ids2 + salt.astype(jnp.int32), dtype=jnp.bfloat16)
            return (e1.astype(jnp.float32).sum()
                    + e2.astype(jnp.float32).sum())
        return jax.grad(loss_of)(p)
    record("embed_fwd_bwd", embed_fwd_bwd, params["embedding"]["table"])

    # tower fwd+bwd on a fixed embedded input (2 texts)
    tower_params = params["query_tower"]

    def tower_fwd_bwd(salt, tp):
        def loss_of(t):
            o1 = transformer_apply(t, spec.tower, embedded,
                                   ids + salt.astype(jnp.int32), train=True)
            o2 = transformer_apply(t, spec.tower, embedded,
                                   ids2 + salt.astype(jnp.int32), train=True)
            return o1.sum() + o2.sum()
        return jax.grad(loss_of)(tp)
    record("tower_fwd_bwd", tower_fwd_bwd, tower_params)

    # attention fwd+bwd: 2 layers x 2 texts = 4 _mha calls on (B, L, H)
    x_blh = jax.device_put(rng.standard_normal(
        (BATCH, SEQ, HID)).astype(np.float32).astype(jnp.bfloat16))
    bias = jnp.zeros((BATCH, 1, 1, SEQ), jnp.float32)
    layer0 = params["query_tower"]["layers"][0]

    def attn_fwd_bwd(salt, layer):
        def loss_of(lyr):
            out = 0.0
            for i in range(2 * LAYERS):
                # per-call scale + carry salt: no CSE, no scan hoisting
                xi = x_blh * (jnp.bfloat16(1.0 + i * 2 ** -10)
                              + salt.astype(jnp.bfloat16))
                out = out + _mha(lyr, xi, bias, HEADS).astype(
                    jnp.float32).sum()
            return out
        return jax.grad(loss_of)(layer)
    record("attn_fwd_bwd_4x", attn_fwd_bwd, layer0)

    # FFN fwd+bwd: 2 layers x 2 texts = 4 GELU FFN blocks
    def ffn_fwd_bwd(salt, layer):
        def loss_of(lyr):
            out = 0.0
            for i in range(2 * LAYERS):
                xi = x_blh * (jnp.bfloat16(1.0 + i * 2 ** -10)
                              + salt.astype(jnp.bfloat16))
                h = jax.nn.gelu(
                    xi @ lyr["ffn1_w"].astype(jnp.bfloat16)
                    + lyr["ffn1_b"].astype(jnp.bfloat16))
                h = h @ lyr["ffn2_w"].astype(jnp.bfloat16) \
                    + lyr["ffn2_b"].astype(jnp.bfloat16)
                out = out + h.astype(jnp.float32).sum()
            return out
        return jax.grad(loss_of)(layer)
    record("ffn_fwd_bwd_4x", ffn_fwd_bwd, layer0)

    # loss fwd+bwd on fixed embeddings (the B x B logits + softmax)
    def loss_fwd_bwd(salt, q):
        def loss_of(qq):
            return in_batch_sampled_softmax_loss(qq + salt, p_emb, weights,
                                                 temperature=0.1)[0]
        return jax.grad(loss_of)(q)
    record("loss_fwd_bwd", loss_fwd_bwd, q_emb)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                state, m = step(state, ids, ids2, None, weights)
            float(m["loss"])
        results["trace_dir"] = args.trace_dir

    print(json.dumps(results, indent=2))
    return 0




# ---------------------------------------------------------------- phase 2
# grad_only(71.3) ~= embed(1.5) + tower(65.9) + loss(0.8); but inside the
# tower, attn(8.8) + ffn(1.8) leave ~55 ms in the composition glue. These
# probes cut the tower differently to find it.

def phase2() -> int:
    from twotowers_tpu.models.seq_towers import (
        _ln, _mha, transformer_apply)
    from twotowers_tpu.ops.core import l2_normalize, masked_mean_pool

    spec, params, loss_def, optimizer, step, state = build()
    rng = np.random.default_rng(0)
    ids = jax.device_put(
        rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
    embedded = jax.device_put(rng.standard_normal(
        (BATCH, SEQ, EMB)).astype(np.float32).astype(jnp.bfloat16))
    x_blh = jax.device_put(rng.standard_normal(
        (BATCH, SEQ, HID)).astype(np.float32).astype(jnp.bfloat16))
    tower_params = params["query_tower"]
    layer0 = tower_params["layers"][0]
    bias = jnp.zeros((BATCH, 1, 1, SEQ), jnp.float32)

    results = {}

    def record(name, fn, *xs):
        try:
            per = _measure(fn, *xs)
            results[name] = round(per * 1e3, 3)
        except Exception as exc:
            results[name] = f"{type(exc).__name__}: {exc}"
        print(f"{name}: {results[name]} ms", file=sys.stderr, flush=True)

    # tower forward only, 2 texts (no grad)
    def tower_fwd(salt, tp):
        o1 = transformer_apply(tp, spec.tower, embedded,
                               ids + salt.astype(jnp.int32), train=True)
        return o1
    record("tower_fwd_1x", tower_fwd, tower_params)

    # tower fwd+bwd, ONE text (composition scaling)
    def tower_fwd_bwd_1x(salt, tp):
        def loss_of(t):
            return transformer_apply(t, spec.tower, embedded,
                                     ids + salt.astype(jnp.int32),
                                     train=True).sum()
        return jax.grad(loss_of)(tp)
    record("tower_fwd_bwd_1x", tower_fwd_bwd_1x, tower_params)

    # one composed block (LN + attn + residual + LN + FFN + residual), x4
    def block_fwd_bwd(salt, layer):
        def loss_of(lyr):
            out = 0.0
            x = x_blh
            for i in range(2 * LAYERS):
                xi = x * (jnp.bfloat16(1.0 + i * 2 ** -10)
                          + salt.astype(jnp.bfloat16))
                h = _ln(xi, lyr["ln1_scale"], lyr["ln1_bias"])
                attn = _mha(lyr, h, bias, HEADS)
                x2 = xi + attn
                h2 = _ln(x2, lyr["ln2_scale"], lyr["ln2_bias"])
                h2 = jax.nn.gelu(h2 @ lyr["ffn1_w"].astype(jnp.bfloat16)
                                 + lyr["ffn1_b"].astype(jnp.bfloat16))
                h2 = h2 @ lyr["ffn2_w"].astype(jnp.bfloat16) \
                    + lyr["ffn2_b"].astype(jnp.bfloat16)
                x = x2 + h2
                out = out + x.astype(jnp.float32).sum()
            return out
        return jax.grad(loss_of)(layer)
    record("block_fwd_bwd_4x", block_fwd_bwd, layer0)

    # LN alone fwd+bwd x12 (6 LNs per text incl. final, 2 texts)
    def ln_fwd_bwd(salt, layer):
        def loss_of(lyr):
            out = 0.0
            for i in range(12):
                xi = x_blh * (jnp.bfloat16(1.0 + i * 2 ** -10)
                              + salt.astype(jnp.bfloat16))
                out = out + _ln(xi, lyr["ln1_scale"], lyr["ln1_bias"]
                                ).astype(jnp.float32).sum()
            return out
        return jax.grad(loss_of)(layer)
    record("ln_fwd_bwd_12x", ln_fwd_bwd, layer0)

    # pool + l2 fwd+bwd x2
    def pool_fwd_bwd(salt, x):
        def loss_of(xx):
            out = 0.0
            for i in range(2):
                xi = xx * (jnp.bfloat16(1.0 + i * 2 ** -10)
                           + salt.astype(jnp.bfloat16))
                pooled = masked_mean_pool(xi, ids)
                out = out + l2_normalize(
                    pooled.astype(jnp.float32)).sum()
            return out
        return jax.grad(loss_of)(x)
    record("pool_l2_fwd_bwd_2x", pool_fwd_bwd, x_blh)

    # input projection + pos add fwd+bwd x2
    def proj_fwd_bwd(salt, tp):
        def loss_of(t):
            out = 0.0
            for i in range(2):
                xi = embedded * (jnp.bfloat16(1.0 + i * 2 ** -10)
                                 + salt.astype(jnp.bfloat16))
                x = xi @ t["proj_w"].astype(jnp.bfloat16) \
                    + t["proj_b"].astype(jnp.bfloat16)
                x = x + t["pos"][:SEQ].astype(jnp.bfloat16)
                out = out + x.astype(jnp.float32).sum()
            return out
        return jax.grad(loss_of)(tp)
    record("proj_pos_fwd_bwd_2x", proj_fwd_bwd, tower_params)

    # attention bias construction + softmax bias add path: mask ops alone
    def bias_fwd(salt, _tp):
        ids_s = ids + salt.astype(jnp.int32)
        key_mask = ids_s > 0
        row_has_valid = jnp.any(key_mask, axis=-1)[:, None, None, None]
        b = jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
        return jnp.where(row_has_valid, b, 0.0)
    record("bias_build_1x", bias_fwd, tower_params)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
