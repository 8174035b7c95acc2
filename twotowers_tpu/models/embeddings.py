"""Embedding-table construction: token ids -> dense vectors.

Capability parity with /root/reference/twotower/embeddings.py (lookup /
word2vec / glove registry), re-designed functionally for TPU: an embedding is
just an f32 ``(vocab_size, dim)`` array in the param pytree plus a spec that
says whether it trains. The lookup itself (`jnp.take`) fuses into the tower;
for sharded vocabularies see ``parallel/embedding_shard.py`` and for the
Pallas scatter-add gradient kernel see ``kernels/pallas_scatter_add.py``.

Pretrained sources (gensim word2vec/GloVe downloads in the reference) are
gated: when gensim or its data are unavailable we fall back to a deterministic
hash initialisation so configs still run end-to-end offline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger
from ..utils.registry import Registry

logger = get_logger("models.embeddings")

EMBEDDING_REGISTRY = Registry("embedding")


@dataclasses.dataclass(frozen=True)
class EmbeddingSpec:
    """Static description of the embedding stage (hashable, jit-closure safe)."""

    kind: str
    vocab_size: int
    embedding_dim: int
    trainable: bool = True
    source: Optional[str] = None  # pretrained vector source name, if any
    padding_idx: int = 0
    max_len: int = 128  # positional-table length ('positional' kind only)


def _zero_pad_row(table: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    return table.at[padding_idx].set(0.0)


@EMBEDDING_REGISTRY.register("lookup")
def _init_lookup(rng: jax.Array, spec: EmbeddingSpec) -> Dict[str, jnp.ndarray]:
    """Trainable lookup table, N(0,1) init with a zero padding row
    (torch nn.Embedding default, reference embeddings.py:24-40)."""
    table = jax.random.normal(rng, (spec.vocab_size, spec.embedding_dim), jnp.float32)
    return {"table": _zero_pad_row(table, spec.padding_idx)}


def _pretrained_vectors(source: str) -> Optional[np.ndarray]:
    """Try to fetch pretrained vectors via gensim; None if unavailable."""
    try:
        import gensim.downloader as api  # type: ignore

        model = api.load(source)
        return np.asarray(model.vectors, dtype=np.float32)
    except Exception as exc:  # pragma: no cover - depends on environment
        logger.warning(
            "Pretrained vectors %r unavailable (%s); falling back to "
            "deterministic hash init.", source, exc,
        )
        return None


def _hash_fallback(spec: EmbeddingSpec) -> jnp.ndarray:
    """Deterministic pseudo-pretrained table keyed on (source, vocab, dim)."""
    seed = abs(hash((spec.source or "fallback", spec.vocab_size, spec.embedding_dim))) % (2**31)
    rng = jax.random.PRNGKey(seed)
    scale = 1.0 / np.sqrt(spec.embedding_dim)
    return jax.random.normal(rng, (spec.vocab_size, spec.embedding_dim), jnp.float32) * scale


def _init_pretrained(rng: jax.Array, spec: EmbeddingSpec) -> Dict[str, jnp.ndarray]:
    """Shared init for word2vec/glove: copy the first vocab_size-1 pretrained
    rows behind the zero padding row (reference embeddings.py:43-155)."""
    del rng
    vectors = _pretrained_vectors(spec.source) if spec.source else None
    if vectors is None:
        table = _hash_fallback(spec)
    else:
        table = np.zeros((spec.vocab_size, spec.embedding_dim), dtype=np.float32)
        n_copy = min(len(vectors), spec.vocab_size - 1)
        width = min(vectors.shape[1], spec.embedding_dim)
        table[1 : 1 + n_copy, :width] = vectors[:n_copy, :width]
        table = jnp.asarray(table)
    return {"table": _zero_pad_row(jnp.asarray(table), spec.padding_idx)}


@EMBEDDING_REGISTRY.register("positional")
def _init_positional(rng: jax.Array, spec: EmbeddingSpec) -> Dict[str, jnp.ndarray]:
    """Lookup table plus learned positional embeddings added at lookup time.

    Advertised by the reference's config docs
    (/root/reference/artifacts/docs/config.md:74: ``type: "positional"``) but
    absent from its registry (embeddings.py:159-164); implemented here.
    """
    t_rng, p_rng = jax.random.split(rng)
    table = jax.random.normal(t_rng, (spec.vocab_size, spec.embedding_dim), jnp.float32)
    return {
        "table": _zero_pad_row(table, spec.padding_idx),
        "pos": 0.02 * jax.random.normal(p_rng, (spec.max_len, spec.embedding_dim), jnp.float32),
    }


EMBEDDING_REGISTRY.add("word2vec", _init_pretrained)
EMBEDDING_REGISTRY.add("glove", _init_pretrained)
# The reference's word2vec_skipgram.yml writes `type: pretrained` although the
# registry key there is `word2vec` (a documented config/registry mismatch,
# SURVEY.md §5); accept both spellings.
EMBEDDING_REGISTRY.add("pretrained", _init_pretrained)


_DEFAULT_SOURCES = {
    "word2vec": "word2vec-google-news-300",
    "pretrained": "word2vec-google-news-300",
    "glove": "glove-wiki-gigaword-50",
}


def spec_from_config(config: Dict[str, Any], vocab_size: int) -> EmbeddingSpec:
    """Build an EmbeddingSpec from the ``embedding:`` config section."""
    kind = config.get("type", "lookup")
    trainable = bool(config.get("trainable", kind in ("lookup", "positional")))
    return EmbeddingSpec(
        kind=kind,
        vocab_size=vocab_size,
        embedding_dim=int(config.get("embedding_dim", 64)),
        trainable=trainable,
        source=config.get("source", _DEFAULT_SOURCES.get(kind)),
        max_len=int(config.get("max_len", 128)),
    )


def init_embedding(rng: jax.Array, spec: EmbeddingSpec) -> Dict[str, jnp.ndarray]:
    """Initialise the embedding params ``{'table': (V, D)}`` for a spec."""
    return EMBEDDING_REGISTRY.get(spec.kind)(rng, spec)


# Below this vocab size the lookup is computed as one_hot(ids) @ table so
# that BOTH directions are MXU matmuls. The autodiff transpose of a gather is
# a scatter-add, and with a small vocabulary nearly every index in the batch
# collides, which serialises the TPU scatter (measured: 561us @ B=1024 and
# 2.3ms @ B=4096 for a 96-row table, vs noise-floor for the matmul form).
# Above the threshold the (B, S, V) one-hot is too large to materialise and
# collisions are rare, so the plain gather wins.
_ONE_HOT_MAX_VOCAB = 512


def embed_ids(params: Dict[str, jnp.ndarray], spec: EmbeddingSpec, ids: jnp.ndarray,
              dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Gather embeddings for ids; frozen tables are stop-gradient'ed so no
    grad buffer or optimizer state is materialised for them."""
    table = params["table"]
    if not spec.trainable:
        table = jax.lax.stop_gradient(table)
    # The one-hot MXU path pays off regardless of trainability: the XLA
    # row-gather costs ~7 ms at the flagship batch where the matmul form is
    # sub-ms (VOCAB_SCALING.json frozen rows), and frozen tables simply never
    # invoke the backward. stop_gradient above already severs the grad.
    if spec.vocab_size <= _ONE_HOT_MAX_VOCAB:
        # precision: in f32 compute the MXU default would round the table
        # operand to bf16 (preferred_element_type only widens the
        # accumulator), silently degrading the lookup and its gradient;
        # HIGHEST keeps the selection bit-exact vs jnp.take and is still an
        # MXU matmul. In bf16 compute the operands are already bf16 and
        # DEFAULT avoids the multi-pass f32 emulation.
        # Invalid ids: one_hot maps out-of-range/negative ids to an all-zero
        # row (== the padding embedding), whereas the gather branch clips to
        # the nearest valid row (jnp.take TPU semantics). Both are silent;
        # tokenizers guarantee ids in [0, vocab), so neither path is hit in
        # normal operation.
        precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        one_hot = jax.nn.one_hot(ids, spec.vocab_size, dtype=dtype)
        out = jnp.einsum("...v,vd->...d", one_hot, table.astype(dtype),
                         preferred_element_type=jnp.float32,
                         precision=precision).astype(dtype)
    else:
        # Word-scale vocabularies: XLA gather forward; the backward routes
        # through the Pallas VMEM scatter-add where it wins (52 ms -> 17 ms
        # at the flagship batch, VOCAB_SCALING.json / BASELINE.md), falling
        # back to plain take off-TPU and for oversized single-chip tables.
        from ..kernels.pallas_scatter_add import take_fast_grad

        out = take_fast_grad(table, ids, dtype)
    if "pos" in params:  # 'positional' kind: learned position offsets
        pos = params["pos"]
        if not spec.trainable:
            pos = jax.lax.stop_gradient(pos)
        seq_len = ids.shape[-1]
        if seq_len > pos.shape[0]:
            raise ValueError(
                f"sequence length {seq_len} exceeds positional table "
                f"max_len {pos.shape[0]}"
            )
        # pad rows must stay exactly zero so masked pooling ignores them
        out = out + jnp.where(
            (ids > 0)[..., None], pos[:seq_len].astype(dtype), 0.0
        )
    return out
