"""Sequence encoder towers: cnn / rnn / transformer.

The reference *documents* these encoder architectures
(/root/reference/artifacts/docs/config.md:81 advertises
``arch: "mean" | "cnn" | "rnn" | "transformer"``) but implements only the
pooling towers — the registry at encoders.py:228-232 has no cnn/rnn/
transformer entries. This module closes that documented-but-missing surface
with TPU-first designs:

* **cnn** — two 1-D convolutions over the sequence (``lax.conv_general_dilated``
  in NWC layout, which XLA lowers onto the MXU), ReLU between, masked max-pool
  over positions, linear projection, L2 norm. Static shapes throughout.
* **rnn** — a GRU scanned over the sequence with ``jax.lax.scan`` (the
  compiler-friendly control flow for sequential recurrence on TPU); pad steps
  carry the previous hidden state so padding is a no-op. Final hidden state,
  L2-normalised.
* **transformer** — input projection + learned positional embeddings, N
  pre-LN self-attention blocks (multi-head, additive key mask, HBM-lean
  softmax: f32 only inside fused reductions — see ``_mha``) with GELU FFNs,
  final LN, masked mean-pool, L2 norm. All matmuls batched and static so
  XLA tiles them onto the MXU; attention over the ≤64 token sequences this
  model family uses needs no flash/blockwise treatment (SURVEY.md §2.4) —
  a whole-sample-in-VMEM Pallas attention kernel was built and measured
  SLOWER than the XLA composite here (BASELINE.md round-4 negative result:
  per-sample tiny matmuls are MXU-issue-bound in a Mosaic scalar loop).

Unlike the pooling towers (which consume a pre-pooled (B, D) vector),
these towers consume the full (B, L, D) token embeddings; ``towers.encode``
dispatches on ``is_sequence_arch``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.core import l2_normalize, masked_mean_pool

Params = Dict[str, Any]

NEG_INF = -1e30

# archs whose apply consumes (B, L, D) token embeddings + ids, not a pooled
# vector; towers.encode dispatches on this set
SEQUENCE_ARCHS = frozenset({"cnn", "rnn", "transformer"})


def is_sequence_arch(arch: str) -> bool:
    return arch in SEQUENCE_ARCHS


def _uniform_init(rng: jax.Array, shape, fan_in: int) -> jnp.ndarray:
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def _linear(rng: jax.Array, fan_in: int, fan_out: int):
    w_rng, b_rng = jax.random.split(rng)
    return (
        _uniform_init(w_rng, (fan_in, fan_out), fan_in),
        _uniform_init(b_rng, (fan_out,), fan_in),
    )


def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
             train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# cnn: conv -> ReLU -> conv -> ReLU -> masked max-pool -> Linear -> L2
# ---------------------------------------------------------------------------

def cnn_init(rng: jax.Array, spec) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    k, d, h = spec.kernel_size, spec.embedding_dim, spec.hidden_dim
    proj_w, proj_b = _linear(r3, h, h)
    return {
        "conv1_w": _uniform_init(r1, (k, d, h), k * d),
        "conv1_b": jnp.zeros((h,), jnp.float32),
        "conv2_w": _uniform_init(r2, (k, h, h), k * h),
        "conv2_b": jnp.zeros((h,), jnp.float32),
        "proj_w": proj_w,
        "proj_b": proj_b,
    }


def _conv1d_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(B, L, C_in) x (K, C_in, C_out) -> (B, L, C_out), SAME padding."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def cnn_apply(params: Params, spec, embedded: jnp.ndarray, ids: jnp.ndarray, *,
              train: bool = False, dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    dtype = embedded.dtype
    mask = (ids > 0)[..., None]  # (B, L, 1)
    x = jnp.where(mask, embedded, 0.0).astype(dtype)
    h = jnp.maximum(_conv1d_same(x, params["conv1_w"]) + params["conv1_b"].astype(dtype), 0.0)
    # re-mask: SAME padding lets pad positions pick up conv responses
    h = jnp.where(mask, h, 0.0)
    h = jnp.maximum(_conv1d_same(h, params["conv2_w"]) + params["conv2_b"].astype(dtype), 0.0)
    h = _dropout(h, spec.dropout, dropout_rng, train)
    pooled = jnp.max(jnp.where(mask, h, NEG_INF), axis=-2)  # (B, H)
    any_valid = jnp.any(mask, axis=-2)  # (B, 1)
    pooled = jnp.where(any_valid, pooled, 0.0)
    out = pooled.astype(jnp.float32) @ params["proj_w"] + params["proj_b"]
    return l2_normalize(out)


# ---------------------------------------------------------------------------
# rnn: GRU over the sequence (lax.scan), final hidden state -> L2
# ---------------------------------------------------------------------------

def rnn_init(rng: jax.Array, spec) -> Params:
    rx, rh, rb = jax.random.split(rng, 3)
    d, h = spec.embedding_dim, spec.hidden_dim
    # torch nn.GRU init: every weight/bias ~ U(-1/sqrt(H), 1/sqrt(H))
    return {
        "w_x": _uniform_init(rx, (d, 3 * h), h),
        "w_h": _uniform_init(rh, (h, 3 * h), h),
        "b": _uniform_init(rb, (3 * h,), h),
    }


def rnn_apply(params: Params, spec, embedded: jnp.ndarray, ids: jnp.ndarray, *,
              train: bool = False, dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    del train, dropout_rng
    batch = embedded.shape[0]
    h_dim = spec.hidden_dim
    dtype = embedded.dtype
    w_x = params["w_x"].astype(dtype)
    w_h = params["w_h"].astype(dtype)
    b = params["b"].astype(dtype)

    xs = jnp.swapaxes(embedded, 0, 1)  # (L, B, D): scan is time-major
    mask = jnp.swapaxes((ids > 0).astype(dtype), 0, 1)[..., None]  # (L, B, 1)
    # hoist the input projection out of the scan: one big (L*B, D)x(D, 3H)
    # MXU matmul instead of L small ones inside the sequential loop
    gates_x = xs @ w_x + b  # (L, B, 3H)

    def step(h, inputs):
        gx, m = inputs
        gh = h @ w_h  # (B, 3H)
        xz, xr, xn = jnp.split(gx, 3, axis=-1)
        hz, hr, hn = jnp.split(gh, 3, axis=-1)
        z = jax.nn.sigmoid(xz + hz)
        r = jax.nn.sigmoid(xr + hr)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h = m * h_new + (1.0 - m) * h  # pad steps carry state unchanged
        return h, None

    h0 = jnp.zeros((batch, h_dim), dtype)
    h_final, _ = jax.lax.scan(step, h0, (gates_x, mask))
    return l2_normalize(h_final.astype(jnp.float32))


# ---------------------------------------------------------------------------
# transformer: proj + learned positions -> N pre-LN MHA+FFN blocks ->
# final LN -> masked mean-pool -> L2
# ---------------------------------------------------------------------------

def transformer_init(rng: jax.Array, spec) -> Params:
    d, h = spec.embedding_dim, spec.hidden_dim
    if h % spec.num_heads:
        raise ValueError(
            f"hidden_dim {h} must divide by num_heads {spec.num_heads}"
        )
    keys = jax.random.split(rng, 2 + spec.num_layers)
    proj_w, proj_b = _linear(keys[0], d, h)
    params: Params = {
        "proj_w": proj_w,
        "proj_b": proj_b,
        "pos": 0.02 * jax.random.normal(keys[1], (spec.max_len, h), jnp.float32),
        "final_ln_scale": jnp.ones((h,), jnp.float32),
        "final_ln_bias": jnp.zeros((h,), jnp.float32),
        "layers": [],
    }
    for i in range(spec.num_layers):
        lk = jax.random.split(keys[2 + i], 6)
        qw, qb = _linear(lk[0], h, h)
        kw, kb = _linear(lk[1], h, h)
        vw, vb = _linear(lk[2], h, h)
        ow, ob = _linear(lk[3], h, h)
        f1w, f1b = _linear(lk[4], h, 4 * h)
        f2w, f2b = _linear(lk[5], 4 * h, h)
        params["layers"].append({
            "ln1_scale": jnp.ones((h,), jnp.float32),
            "ln1_bias": jnp.zeros((h,), jnp.float32),
            "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
            "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob,
            "ln2_scale": jnp.ones((h,), jnp.float32),
            "ln2_bias": jnp.zeros((h,), jnp.float32),
            "ffn1_w": f1w, "ffn1_b": f1b, "ffn2_w": f2w, "ffn2_b": f2b,
        })
    return params


def _ln(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
        eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _mha(layer: Params, x: jnp.ndarray, attn_bias: jnp.ndarray,
         num_heads: int) -> jnp.ndarray:
    """Multi-head self-attention, HBM-lean (profiled: tools/trace_transformer).

    Two deliberate deviations from the textbook formulation, both worth
    ~tens of ms/step at the bench shape (B 4096, L 48, H 128, 4 heads):

    * Heads stay in the natural (B, L, heads, head_dim) layout and the
      einsums carry the head axis directly — the classic
      ``.transpose(0, 2, 1, 3)`` materialised (B, H, L, hd) copies of
      q/k/v/attn in HBM (~13 ms/step of pure data formatting).
    * The (B, H, L, L) score/weight tensors — the step's largest, and
      lane-padded L 48->128 so each f32 instance is physically 402 MB —
      are never materialised in f32. The softmax runs max-subtracted with
      the exp upcast to f32 *inside* the fusion and the normaliser summed
      in f32, so only bf16 tensors ever hit HBM. Max/exp/sum in this
      arrangement is the standard flash-attention numerics; the bf16
      rounding of the normalised weights is ~3e-3 relative, below the
      training noise floor (verified against the f32 path in
      tests/test_seq_towers.py).
    """
    batch, seq, h = x.shape
    head_dim = h // num_heads
    dtype = x.dtype

    def project(w, b):
        y = x @ w.astype(dtype) + b.astype(dtype)
        return y.reshape(batch, seq, num_heads, head_dim)

    q = project(layer["q_w"], layer["q_b"])  # (B, L, H, hd) — natural layout
    k = project(layer["k_w"], layer["k_b"])
    v = project(layer["v_w"], layer["v_b"])
    scale = (1.0 / float(head_dim) ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(scale, dtype)
    scores = scores + attn_bias.astype(dtype)  # bias: 0 / -1e30 (bf16-exact)
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(dtype)
    z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    weights = (e / z.astype(dtype)).astype(dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(batch, seq, h)
    return attn @ layer["o_w"].astype(dtype) + layer["o_b"].astype(dtype)


def transformer_apply(params: Params, spec, embedded: jnp.ndarray,
                      ids: jnp.ndarray, *, train: bool = False,
                      dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    batch, seq, _ = embedded.shape
    if seq > spec.max_len:
        raise ValueError(
            f"sequence length {seq} exceeds transformer max_len {spec.max_len}"
        )
    dtype = embedded.dtype
    x = embedded @ params["proj_w"].astype(dtype) + params["proj_b"].astype(dtype)
    x = x + params["pos"][:seq].astype(dtype)

    key_mask = ids > 0  # (B, L)
    # rows with zero valid tokens would softmax over all -inf; let those rows
    # attend uniformly instead (their output is discarded by the pool mask)
    row_has_valid = jnp.any(key_mask, axis=-1)[:, None, None, None]
    bias = jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
    attn_bias = jnp.where(row_has_valid, bias, 0.0)  # (B, 1, 1, L) f32

    n_layers = len(params["layers"])
    rngs = [None] * (2 * n_layers)
    if dropout_rng is not None and train and spec.dropout > 0.0:
        rngs = list(jax.random.split(dropout_rng, 2 * n_layers))
    for i, layer in enumerate(params["layers"]):
        h = _ln(x, layer["ln1_scale"], layer["ln1_bias"])
        attn = _mha(layer, h, attn_bias, spec.num_heads)
        x = x + _dropout(attn, spec.dropout, rngs[2 * i], train)
        h = _ln(x, layer["ln2_scale"], layer["ln2_bias"])
        h = jax.nn.gelu(h @ layer["ffn1_w"].astype(dtype) + layer["ffn1_b"].astype(dtype))
        h = h @ layer["ffn2_w"].astype(dtype) + layer["ffn2_b"].astype(dtype)
        x = x + _dropout(h, spec.dropout, rngs[2 * i + 1], train)

    x = _ln(x, params["final_ln_scale"], params["final_ln_bias"])
    pooled = masked_mean_pool(x, ids)
    return l2_normalize(pooled.astype(jnp.float32))
