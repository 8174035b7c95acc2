#!/usr/bin/env python
"""Transformer hostile-shape layout A/B (VERDICT r4 #6).

The round-4 trace attributed ~13 ms/step of the 66 ms hostile-shape
(head_dim 32 / L 48) transformer step to (B,L,H,hd)->(B,H,L,hd) layout
copies XLA materialises for the attention dot_generals. One targeted
counter-formulation, measured A/B on the chip:

  A (current, models/seq_towers._mha): q/k/v projected to the natural
    (B, L, H, hd); the score einsum 'bqhd,bkhd->bhqk' forces XLA to copy
    operands into (B,H)-leading layout.
  B (head-major): q/k/v projected DIRECTLY to (B, H, L, hd) via
    einsum('ble,ehd->bhld') with the projection weight reshaped to
    (E, H, hd) — the transpose rides the projection matmul's output
    indexing (an epilogue permutation, fusable) instead of a standalone
    copy; scores/attn then use 'bhqd,bhkd->bhqk' / 'bhqk,bhkd->bhqd'
    whose batch dims already lead, and the output projection contracts
    (h,d) in one einsum 'bhqd,hde->bqe'.

Parity is asserted (same params, same inputs, allclose outputs) before
timing. The full train step is timed with bench.py's relay-proof
protocol at the hostile bench shape; result goes to TF_LAYOUT_AB.json.

Run: python tools/exp_tf_layout.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import twotowers_tpu.models.seq_towers as st


def _mha_headmajor(layer, x, attn_bias, num_heads):
    """Variant B: head-major q/k/v straight out of the projections."""
    batch, seq, h = x.shape
    head_dim = h // num_heads
    dtype = x.dtype

    def project(w, b):
        w_hm = w.astype(dtype).reshape(h, num_heads, head_dim)
        b_hm = b.astype(dtype).reshape(num_heads, 1, head_dim)
        return jnp.einsum("ble,ehd->bhld", x, w_hm) + b_hm

    q = project(layer["q_w"], layer["q_b"])  # (B, H, L, hd)
    k = project(layer["k_w"], layer["k_b"])
    v = project(layer["v_w"], layer["v_b"])
    scale = (1.0 / float(head_dim) ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, dtype)
    scores = scores + attn_bias.astype(dtype)
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(dtype)
    z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    weights = (e / z.astype(dtype)).astype(dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    o_hm = layer["o_w"].astype(dtype).reshape(num_heads, head_dim, h)
    return jnp.einsum("bhqd,hde->bqe", attn, o_hm) + layer["o_b"].astype(dtype)


def check_parity() -> float:
    """Max |A - B| on a small random layer (f32, CPU-or-chip agnostic)."""
    rng = jax.random.PRNGKey(0)
    h, heads, batch, seq = 64, 4, 8, 12
    keys = jax.random.split(rng, 6)
    layer = {
        "q_w": jax.random.normal(keys[0], (h, h)) * 0.1,
        "q_b": jax.random.normal(keys[1], (h,)) * 0.1,
        "k_w": jax.random.normal(keys[2], (h, h)) * 0.1,
        "k_b": jnp.zeros((h,)),
        "v_w": jax.random.normal(keys[3], (h, h)) * 0.1,
        "v_b": jnp.zeros((h,)),
        "o_w": jax.random.normal(keys[4], (h, h)) * 0.1,
        "o_b": jnp.zeros((h,)),
    }
    x = jax.random.normal(keys[5], (batch, seq, h))
    bias = jnp.zeros((batch, 1, 1, seq))
    a = st._mha(layer, x, bias, heads)
    b = _mha_headmajor(layer, x, bias, heads)
    return float(jnp.max(jnp.abs(a - b)))


def main() -> int:
    import bench

    err = check_parity()
    print(f"parity max|A-B| = {err:.2e}", flush=True)
    assert err < 1e-4, "head-major variant diverges from current _mha"

    original = st._mha
    results = {}
    for name, fn in (("current_blhd", original),
                     ("headmajor_bhld", _mha_headmajor)):
        st._mha = fn
        row = bench._with_retries(
            lambda: bench._bench_transformer_tower(), f"tf_layout_{name}")
        results[name] = row
        print(f"{name}: {row['step_time_ms']} ms/step "
              f"(IQR {row.get('step_time_iqr_ms')})", flush=True)
    st._mha = original

    a = results["current_blhd"]["step_time_ms"]
    b = results["headmajor_bhld"]["step_time_ms"]
    record = {
        "experiment": "transformer hostile-shape layout A/B (VERDICT r4 #6)",
        "shape": results["current_blhd"]["shape"],
        "results": results,
        "speedup_headmajor": round(a / b, 3),
        "winner": "headmajor_bhld" if b < a else "current_blhd",
    }
    out = Path(__file__).resolve().parents[1] / "TF_LAYOUT_AB.json"
    out.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps({k: record[k] for k in ("speedup_headmajor", "winner")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
