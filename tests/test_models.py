"""Unit tests for ops, embeddings, towers and losses.

Golden values are hand-computed with numpy against the reference formulas
(/root/reference/twotower/{encoders,losses}.py) so numeric parity is provable
without importing any torch code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twotowers_tpu.models import (
    EmbeddingSpec,
    TowerSpec,
    TwoTowerSpec,
    build_loss,
    count_params,
    encode,
    forward,
    init_two_tower,
)
from twotowers_tpu.models.embeddings import embed_ids, init_embedding
from twotowers_tpu.models.losses import (
    contrastive_triplet_loss,
    in_batch_sampled_softmax_loss,
    multiple_negatives_loss,
)
from twotowers_tpu.ops.core import cosine_similarity, l2_normalize, masked_mean_pool


def _spec(vocab=11, dim=8, hidden=16, arch="mean", tied=False):
    return TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=vocab, embedding_dim=dim),
        tower=TowerSpec(arch=arch, embedding_dim=dim, hidden_dim=hidden),
        tied_weights=tied,
    )


class TestOps:
    def test_masked_mean_pool_ignores_pad(self, np_rng):
        emb = np_rng.normal(size=(2, 4, 3)).astype(np.float32)
        ids = np.array([[5, 7, 0, 0], [1, 2, 3, 4]], dtype=np.int32)
        pooled = masked_mean_pool(jnp.asarray(emb), jnp.asarray(ids))
        expected0 = emb[0, :2].sum(0) / (2 + 1e-9)
        expected1 = emb[1].sum(0) / (4 + 1e-9)
        np.testing.assert_allclose(pooled[0], expected0, rtol=1e-6)
        np.testing.assert_allclose(pooled[1], expected1, rtol=1e-6)

    def test_all_pad_row_is_finite(self):
        emb = jnp.ones((1, 3, 2))
        ids = jnp.zeros((1, 3), dtype=jnp.int32)
        pooled = masked_mean_pool(emb, ids)
        assert np.all(np.isfinite(np.asarray(pooled)))
        np.testing.assert_allclose(np.asarray(pooled), 0.0, atol=1e-6)

    def test_l2_normalize_unit_norm(self, np_rng):
        x = jnp.asarray(np_rng.normal(size=(5, 7)).astype(np.float32))
        normed = l2_normalize(x)
        np.testing.assert_allclose(np.linalg.norm(normed, axis=-1), 1.0, rtol=1e-5)

    def test_cosine_matches_numpy(self, np_rng):
        a = np_rng.normal(size=(4, 6)).astype(np.float32)
        b = np_rng.normal(size=(4, 6)).astype(np.float32)
        got = cosine_similarity(jnp.asarray(a), jnp.asarray(b))
        want = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestEmbeddings:
    def test_lookup_init_zero_pad_row(self, rng):
        spec = EmbeddingSpec(kind="lookup", vocab_size=10, embedding_dim=4)
        params = init_embedding(rng, spec)
        assert params["table"].shape == (10, 4)
        np.testing.assert_allclose(params["table"][0], 0.0)

    def test_embed_ids_gathers(self, rng):
        spec = EmbeddingSpec(kind="lookup", vocab_size=10, embedding_dim=4)
        params = init_embedding(rng, spec)
        ids = jnp.array([[1, 2], [3, 0]], dtype=jnp.int32)
        out = embed_ids(params, spec, ids)
        assert out.shape == (2, 2, 4)
        np.testing.assert_allclose(out[1, 1], 0.0)

    def test_frozen_embedding_stops_gradient(self, rng):
        spec = EmbeddingSpec(kind="lookup", vocab_size=10, embedding_dim=4, trainable=False)
        params = init_embedding(rng, spec)

        def loss(p):
            return jnp.sum(embed_ids(p, spec, jnp.array([[1, 2]])))

        grads = jax.grad(loss)(params)
        np.testing.assert_allclose(grads["table"], 0.0)

    def test_pretrained_fallback_is_deterministic(self, rng):
        spec = EmbeddingSpec(
            kind="glove", vocab_size=10, embedding_dim=4,
            trainable=False, source="definitely-not-a-real-source",
        )
        a = init_embedding(rng, spec)["table"]
        b = init_embedding(rng, spec)["table"]
        np.testing.assert_allclose(a, b)
        np.testing.assert_allclose(a[0], 0.0)


class TestTowers:
    def test_mean_tower_output_shape_and_norm(self, rng):
        spec = _spec()
        params = init_two_tower(rng, spec)
        ids = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], dtype=jnp.int32)
        out = encode(params, spec, ids, "query")
        assert out.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    def test_mean_tower_golden_numpy(self, rng):
        """Tower output == hand-computed pool->FFN->normalize per encoders.py:62-77."""
        spec = _spec(vocab=7, dim=4, hidden=5)
        params = init_two_tower(rng, spec)
        ids = np.array([[1, 2, 0]], dtype=np.int32)
        table = np.asarray(params["embedding"]["table"])
        q = params["query_tower"]
        emb = table[ids[0]] * (ids[0] > 0)[:, None]
        pooled = emb.sum(0) / ((ids[0] > 0).sum() + 1e-9)
        h = np.maximum(pooled @ np.asarray(q["w1"]) + np.asarray(q["b1"]), 0)
        out = h @ np.asarray(q["w2"]) + np.asarray(q["b2"])
        out = out / np.linalg.norm(out)
        got = encode(params, spec, jnp.asarray(ids), "query")[0]
        np.testing.assert_allclose(np.asarray(got), out, rtol=1e-5, atol=1e-6)

    def test_tied_weights_share_params(self, rng):
        spec = _spec(tied=True)
        params = init_two_tower(rng, spec)
        assert "document_tower" not in params
        ids = jnp.array([[1, 2, 3, 0]], dtype=jnp.int32)
        q = encode(params, spec, ids, "query")
        d = encode(params, spec, ids, "document")
        np.testing.assert_allclose(q, d)

    def test_untied_towers_differ(self, rng):
        spec = _spec(tied=False)
        params = init_two_tower(rng, spec)
        ids = jnp.array([[1, 2, 3, 0]], dtype=jnp.int32)
        q = encode(params, spec, ids, "query")
        d = encode(params, spec, ids, "document")
        assert not np.allclose(np.asarray(q), np.asarray(d))

    def test_avg_pool_identity_when_dims_match(self, rng):
        spec = _spec(dim=8, hidden=8, arch="avg_pool")
        params = init_two_tower(rng, spec)
        assert params["query_tower"] == {}
        ids = jnp.array([[1, 2, 0, 0]], dtype=jnp.int32)
        out = encode(params, spec, ids, "query")
        # no projection: output is just the normalised pooled embedding
        table = np.asarray(params["embedding"]["table"])
        pooled = table[[1, 2]].sum(0) / (2 + 1e-9)
        want = pooled / np.linalg.norm(pooled)
        np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-5)

    def test_avg_pool_projection_when_dims_differ(self, rng):
        spec = _spec(dim=8, hidden=4, arch="avg_pool")
        params = init_two_tower(rng, spec)
        assert set(params["query_tower"]) == {"proj_w", "proj_b", "ln_scale", "ln_bias"}
        ids = jnp.array([[1, 2, 0, 0]], dtype=jnp.int32)
        out = encode(params, spec, ids, "query")
        assert out.shape == (1, 4)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    def test_forward_arities(self, rng):
        spec = _spec()
        params = init_two_tower(rng, spec)
        ids = jnp.array([[1, 2, 3, 0]], dtype=jnp.int32)
        assert forward(params, spec, ids).shape == (1, 16)
        q, d = forward(params, spec, ids, ids)
        assert q.shape == d.shape == (1, 16)
        q, d, n = forward(params, spec, ids, ids, ids)
        assert n.shape == (1, 16)

    def test_count_params(self, rng):
        spec = _spec(vocab=11, dim=8, hidden=16, tied=True)
        params = init_two_tower(rng, spec)
        # table 11*8 + w1 8*16 + b1 16 + w2 16*16 + b2 16
        assert count_params(params) == 11 * 8 + 8 * 16 + 16 + 16 * 16 + 16

    def test_jit_encode(self, rng):
        spec = _spec()
        params = init_two_tower(rng, spec)
        ids = jnp.array([[1, 2, 3, 0]], dtype=jnp.int32)
        jitted = jax.jit(lambda p, i: encode(p, spec, i, "query"))
        np.testing.assert_allclose(
            jitted(params, ids), encode(params, spec, ids), rtol=1e-5, atol=1e-7
        )


def _unit(np_rng, shape):
    x = np_rng.normal(size=shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestLosses:
    def test_triplet_golden(self, np_rng):
        q, p, n = (_unit(np_rng, (6, 8)) for _ in range(3))
        loss, aux = contrastive_triplet_loss(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n))
        sim_pos = (q * p).sum(-1)
        sim_neg = (q * n).sum(-1)
        want = np.maximum(0.2 - sim_pos + sim_neg, 0).mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)
        np.testing.assert_allclose(float(aux["pos_similarity"]), sim_pos.mean(), rtol=1e-5)

    def test_triplet_margin_kwarg(self, np_rng):
        q, p, n = (_unit(np_rng, (4, 8)) for _ in range(3))
        loss_def = build_loss("triplet", margin=0.5)
        loss, _ = loss_def.fn(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n), None)
        want = np.maximum(0.5 - (q * p).sum(-1) + (q * n).sum(-1), 0).mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_triplet_weighted_mean_matches_subset(self, np_rng):
        q, p, n = (_unit(np_rng, (6, 8)) for _ in range(3))
        w = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)
        loss_w, _ = contrastive_triplet_loss(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(n), jnp.asarray(w)
        )
        loss_sub, _ = contrastive_triplet_loss(
            jnp.asarray(q[:4]), jnp.asarray(p[:4]), jnp.asarray(n[:4])
        )
        np.testing.assert_allclose(float(loss_w), float(loss_sub), rtol=1e-6)

    def test_in_batch_golden(self, np_rng):
        q, d = _unit(np_rng, (5, 8)), _unit(np_rng, (5, 8))
        loss, _ = in_batch_sampled_softmax_loss(jnp.asarray(q), jnp.asarray(d))
        logits = (q @ d.T) / 0.1
        logZ = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) + logits.max(1)
        want = (logZ - np.diag(logits)).mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_in_batch_pad_rows_masked(self, np_rng):
        q, d = _unit(np_rng, (6, 8)), _unit(np_rng, (6, 8))
        w = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)
        loss_w, _ = in_batch_sampled_softmax_loss(
            jnp.asarray(q), jnp.asarray(d), jnp.asarray(w)
        )
        loss_sub, _ = in_batch_sampled_softmax_loss(jnp.asarray(q[:4]), jnp.asarray(d[:4]))
        np.testing.assert_allclose(float(loss_w), float(loss_sub), rtol=1e-5)

    def test_multiple_negatives_golden(self, np_rng):
        q, p = _unit(np_rng, (4, 8)), _unit(np_rng, (4, 8))
        negs = _unit(np_rng, (4, 3, 8))
        loss, _ = multiple_negatives_loss(jnp.asarray(q), jnp.asarray(p), jnp.asarray(negs))
        cands = np.concatenate([p[:, None], negs], axis=1)
        sims = (q[:, None] * cands).sum(-1) / 0.1
        logZ = np.log(np.exp(sims - sims.max(1, keepdims=True)).sum(1)) + sims.max(1)
        want = (logZ - sims[:, 0]).mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_loss_arity_metadata(self):
        assert build_loss("triplet").arity == "triplet"
        assert build_loss("in_batch").arity == "pair"
        assert build_loss("multiple_negatives").arity == "multi_neg"

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError, match="Unknown loss"):
            build_loss("nonexistent")

    def test_losses_jit_and_grad(self, rng, np_rng):
        q, p, n = (jnp.asarray(_unit(np_rng, (4, 8))) for _ in range(3))

        @jax.jit
        def f(q):
            return contrastive_triplet_loss(q, p, n)[0]

        g = jax.grad(f)(q)
        assert g.shape == q.shape
        assert np.all(np.isfinite(np.asarray(g)))
