#!/usr/bin/env python
"""A/B: fused Pallas embed+pool kernel vs the XLA gather+pool and one-hot
paths, fwd+bwd, at vocabs between the one-hot ceiling (512) and the kernel's
VMEM limit — the range where the kernel could earn its keep (VERDICT r2
item 6: auto-dispatch it if it wins anywhere, delete it if not).

Measures d(table) through value_and_grad of sum(pool * g) — the actual
training-path usage. Writes EMBED_POOL_AB.json.

Run: python tools/bench_embed_pool_ab.py [batch] [seq] [dim]
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

from twotowers_tpu.kernels.pallas_embed_pool import embed_pool, embed_pool_fits_vmem
from twotowers_tpu.ops.core import masked_mean_pool

CHAIN = 9


def zipf_ids(rng, vocab, shape):
    ranks = np.arange(1, vocab)
    w = 1.0 / np.power(ranks, 1.07)
    w /= w.sum()
    return rng.choice(np.arange(1, vocab), size=shape, p=w).astype(np.int32)


def timeit_grad(pool_fn, table, ids, g_out):
    """Relay-proof time of value_and_grad wrt table of sum(pool * g_out)."""

    def loss(tab):
        return jnp.sum(pool_fn(ids, tab) * g_out)

    grad = jax.grad(loss)

    def make(iters):
        @jax.jit
        def run(tab):
            def body(t, _):
                d = grad(t)
                return t + d * 1e-30, None
            final, _ = jax.lax.scan(body, tab, None, length=iters)
            return final[0, 0]
        return run

    one, many = make(1), make(CHAIN)
    float(one(table)); float(many(table))

    def best(f):
        out = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(table))
            out = min(out, time.perf_counter() - t0)
        return out

    t1, tn = best(one), best(many)
    if tn <= t1:
        raise RuntimeError("noise-inverted measurement")
    return (tn - t1) / (CHAIN - 1)


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.default_rng(0)
    g_out = jax.device_put(
        rng.standard_normal((batch, dim)).astype(np.float32))

    def pool_gather(ids, tab):
        emb = jnp.take(tab.astype(jnp.bfloat16), ids, axis=0)
        return masked_mean_pool(emb, ids).astype(jnp.float32)

    def pool_onehot(ids, tab):
        oh = jax.nn.one_hot(ids, tab.shape[0], dtype=jnp.bfloat16)
        emb = jnp.einsum("...v,vd->...d", oh, tab.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return masked_mean_pool(emb.astype(jnp.bfloat16), ids).astype(jnp.float32)

    def pool_fused(ids, tab):
        return embed_pool(ids, tab)

    def pool_take_fast(ids, tab):
        from twotowers_tpu.kernels.pallas_scatter_add import take_fast_grad

        emb = take_fast_grad(tab, ids, jnp.bfloat16)
        return masked_mean_pool(emb, ids).astype(jnp.float32)

    rows = []
    for vocab in (512, 2048, 8192):
        ids = jax.device_put(zipf_ids(rng, vocab, (batch, seq)))
        table = jax.device_put(
            rng.standard_normal((vocab, dim)).astype(np.float32))
        row = {"vocab": vocab}
        for name, fn in (("gather_pool", pool_gather),
                         ("one_hot", pool_onehot),
                         ("fused_pallas", pool_fused),
                         ("take_scatter_kernel", pool_take_fast)):
            if name == "fused_pallas" and not embed_pool_fits_vmem(vocab, dim):
                row[name] = None
                continue
            try:
                t = timeit_grad(fn, table, ids, g_out)
                row[f"{name}_ms"] = round(t * 1e3, 3)
                print(f"vocab {vocab:6d} {name:13s}: {t*1e3:8.3f} ms "
                      f"(fwd+bwd)", flush=True)
            except Exception as exc:
                row[f"{name}_error"] = f"{type(exc).__name__}: {exc}"
                print(f"vocab {vocab:6d} {name:13s}: FAILED {exc}", flush=True)
        rows.append(row)

    out = Path(__file__).resolve().parents[1] / "EMBED_POOL_AB.json"
    out.write_text(json.dumps({
        "bench": "embed_pool_fwd_bwd_ab",
        "batch": batch, "seq": seq, "dim": dim,
        "id_distribution": "zipf(1.07)",
        "device": str(jax.devices()[0]),
        "protocol": "relay-proof lax.scan chain, (T(N)-T(1))/(N-1), best of 3",
        "results": rows,
    }, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
