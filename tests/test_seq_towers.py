"""Tests for the sequence towers (cnn / rnn / transformer), the positional
embedding kind, and the cosine / contrastive losses — the encoder and loss
surface the reference's config docs advertise
(/root/reference/artifacts/docs/config.md:65,74,81,90) but never implement.
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
    encode,
    forward,
    init_two_tower,
    spec_from_config,
)
from twotowers_tpu.models.embeddings import embed_ids, init_embedding
from twotowers_tpu.models.losses import (
    contrastive_triplet_loss,
    cosine_embedding_loss,
)
from twotowers_tpu.models.seq_towers import is_sequence_arch

SEQ_ARCHS = ["cnn", "rnn", "transformer"]


def _spec(arch, vocab=37, dim=12, hidden=16, emb_kind="lookup", **tower_kw):
    tower_kw.setdefault("num_heads", 4)
    tower_kw.setdefault("num_layers", 2)
    tower_kw.setdefault("max_len", 24)
    return TwoTowerSpec(
        embedding=EmbeddingSpec(
            kind=emb_kind, vocab_size=vocab, embedding_dim=dim, max_len=24
        ),
        tower=TowerSpec(arch=arch, embedding_dim=dim, hidden_dim=hidden, **tower_kw),
    )


def _ids(np_rng, batch=5, seq=10, vocab=37):
    ids = np_rng.integers(1, vocab, size=(batch, seq)).astype(np.int32)
    ids[1, 6:] = 0  # trailing pad
    ids[3] = 0  # all-pad row
    return jnp.asarray(ids)


class TestSequenceTowers:
    @pytest.mark.parametrize("arch", SEQ_ARCHS)
    def test_output_shape_and_unit_norm(self, np_rng, arch):
        spec = _spec(arch)
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        ids = _ids(np_rng)
        out = jax.jit(lambda p, i: encode(p, spec, i))(params, ids)
        out = np.asarray(out)
        assert out.shape == (5, 16)
        assert np.all(np.isfinite(out))
        norms = np.linalg.norm(out[[0, 1, 2, 4]], axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    @pytest.mark.parametrize("arch", SEQ_ARCHS)
    def test_gradients_finite_with_all_pad_row(self, np_rng, arch):
        spec = _spec(arch)
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        q_ids, d_ids = _ids(np_rng), _ids(np_rng)
        weights = jnp.asarray([1.0, 1.0, 1.0, 0.0, 1.0])
        loss_def = build_loss("triplet")

        def loss_of(p):
            q = encode(p, spec, q_ids, train=True,
                       dropout_rng=jax.random.PRNGKey(1))
            d = encode(p, spec, d_ids, "document")
            n = encode(p, spec, d_ids[::-1], "document")
            return loss_def.fn(q, d, n, weights)[0]

        loss, grads = jax.value_and_grad(loss_of)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert np.isfinite(float(loss))
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0.0

    @pytest.mark.parametrize("arch", SEQ_ARCHS)
    def test_padding_invariance(self, np_rng, arch):
        """Extending sequences with PAD must not change the encoding."""
        spec = _spec(arch)
        params = init_two_tower(jax.random.PRNGKey(2), spec)
        short = jnp.asarray(
            np_rng.integers(1, 37, size=(3, 8)).astype(np.int32)
        )
        padded = jnp.concatenate(
            [short, jnp.zeros((3, 6), jnp.int32)], axis=1
        )
        out_short = np.asarray(encode(params, spec, short))
        out_padded = np.asarray(encode(params, spec, padded))
        np.testing.assert_allclose(out_short, out_padded, atol=1e-5)

    def test_registry_dispatch_flags(self):
        for arch in SEQ_ARCHS:
            assert is_sequence_arch(arch)
        for arch in ["mean", "avg_pool"]:
            assert not is_sequence_arch(arch)

    def test_rnn_respects_token_order(self, np_rng):
        spec = _spec("rnn")
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        ids = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
        rev = jnp.asarray([[9, 7, 5, 3]], jnp.int32)
        a = np.asarray(encode(params, spec, ids))
        b = np.asarray(encode(params, spec, rev))
        assert not np.allclose(a, b)

    def test_transformer_seq_longer_than_max_len_raises(self, np_rng):
        spec = _spec("transformer", max_len=8)
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        ids = jnp.ones((2, 9), jnp.int32)
        with pytest.raises(ValueError, match="max_len"):
            encode(params, spec, ids)

    @pytest.mark.parametrize("arch", SEQ_ARCHS)
    def test_forward_three_outputs_and_tied_weights(self, np_rng, arch):
        spec = TwoTowerSpec(
            embedding=EmbeddingSpec(kind="lookup", vocab_size=37,
                                    embedding_dim=12),
            tower=TowerSpec(arch=arch, embedding_dim=12, hidden_dim=16,
                            num_heads=4, num_layers=1, max_len=24),
            tied_weights=True,
        )
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        assert "document_tower" not in params
        ids = _ids(np_rng)
        q, d, n = forward(params, spec, ids, ids, ids)
        np.testing.assert_allclose(np.asarray(q), np.asarray(d), atol=1e-6)

    def test_spec_from_config_reads_arch_fields(self):
        cfg = {
            "embedding": {"type": "lookup", "embedding_dim": 24},
            "encoder": {
                "arch": "transformer", "hidden_dim": 48, "num_heads": 6,
                "num_layers": 3, "kernel_size": 5, "max_len": 96,
            },
        }
        spec = spec_from_config(cfg, vocab_size=100)
        t = spec.tower
        assert (t.arch, t.hidden_dim, t.num_heads, t.num_layers,
                t.kernel_size, t.max_len) == ("transformer", 48, 6, 3, 5, 96)

    def test_bf16_compute(self, np_rng):
        spec = TwoTowerSpec(
            embedding=EmbeddingSpec(kind="lookup", vocab_size=37,
                                    embedding_dim=16),
            tower=TowerSpec(arch="transformer", embedding_dim=16,
                            hidden_dim=32, num_heads=4, num_layers=1,
                            max_len=24),
            compute_dtype=jnp.bfloat16,
        )
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        ids = _ids(np_rng)
        out = np.asarray(encode(params, spec, ids))
        assert out.dtype == np.float32  # final norm runs in f32
        assert np.all(np.isfinite(out))


class TestAttentionNumerics:
    """The HBM-lean _mha (bf16 score tensors, f32 only inside the fused
    exp/sum — seq_towers.py docstring) must match the textbook f32-softmax
    formulation to bf16 rounding."""

    def _reference_mha(self, layer, x, attn_bias, num_heads):
        batch, seq, h = x.shape
        head_dim = h // num_heads
        dtype = x.dtype

        def project(w, b):
            y = x @ w.astype(dtype) + b.astype(dtype)
            return y.reshape(batch, seq, num_heads, head_dim).transpose(
                0, 2, 1, 3)

        q = project(layer["q_w"], layer["q_b"])
        k = project(layer["k_w"], layer["k_b"])
        v = project(layer["v_w"], layer["v_b"])
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)).astype(dtype)
        weights = jax.nn.softmax(
            scores.astype(jnp.float32) + attn_bias, axis=-1).astype(dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(batch, seq, h)
        return attn @ layer["o_w"].astype(dtype) + layer["o_b"].astype(dtype)

    @pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                           (jnp.bfloat16, 2e-2)])
    def test_matches_f32_softmax_reference(self, np_rng, dtype, tol):
        from twotowers_tpu.models.seq_towers import _mha, transformer_init

        spec = _spec("transformer", dim=16, hidden=16).tower
        params = transformer_init(jax.random.PRNGKey(3), spec)
        layer = params["layers"][0]
        x = jnp.asarray(np_rng.normal(size=(4, 10, 16)), jnp.float32
                        ).astype(dtype)
        ids = _ids(np_rng, batch=4, seq=10)
        key_mask = ids > 0
        row_has_valid = jnp.any(key_mask, axis=-1)[:, None, None, None]
        bias = jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
        attn_bias = jnp.where(row_has_valid, bias, 0.0)

        got = _mha(layer, x, attn_bias, spec.num_heads)
        want = self._reference_mha(layer, x, attn_bias, spec.num_heads)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol)


class TestPositionalEmbedding:
    def test_positions_added_only_on_real_tokens(self, np_rng):
        spec = EmbeddingSpec(kind="positional", vocab_size=19,
                             embedding_dim=6, max_len=10)
        params = init_embedding(jax.random.PRNGKey(0), spec)
        ids = jnp.asarray([[4, 7, 0, 0]], jnp.int32)
        out = np.asarray(embed_ids(params, spec, ids))
        table = np.asarray(params["table"])
        pos = np.asarray(params["pos"])
        np.testing.assert_allclose(out[0, 0], table[4] + pos[0], rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], table[7] + pos[1], rtol=1e-6)
        np.testing.assert_allclose(out[0, 2:], 0.0, atol=1e-6)  # pad rows stay 0

    def test_same_token_different_positions_differ(self):
        spec = EmbeddingSpec(kind="positional", vocab_size=19,
                             embedding_dim=6, max_len=10)
        params = init_embedding(jax.random.PRNGKey(0), spec)
        ids = jnp.asarray([[5, 5]], jnp.int32)
        out = np.asarray(embed_ids(params, spec, ids))
        assert not np.allclose(out[0, 0], out[0, 1])

    def test_too_long_sequence_raises(self):
        spec = EmbeddingSpec(kind="positional", vocab_size=19,
                             embedding_dim=6, max_len=4)
        params = init_embedding(jax.random.PRNGKey(0), spec)
        with pytest.raises(ValueError, match="max_len"):
            embed_ids(params, spec, jnp.ones((1, 5), jnp.int32))

    def test_spec_from_config_positional_trainable_default(self):
        from twotowers_tpu.models.embeddings import (
            spec_from_config as emb_spec_from_config,
        )
        spec = emb_spec_from_config({"type": "positional"}, vocab_size=10)
        assert spec.trainable


class TestNewLosses:
    def test_cosine_golden(self, np_rng):
        q = np_rng.normal(size=(4, 8)).astype(np.float32)
        p = np_rng.normal(size=(4, 8)).astype(np.float32)
        n = np_rng.normal(size=(4, 8)).astype(np.float32)

        def cos(a, b):
            return (a * b).sum(-1) / np.maximum(
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8
            )

        margin = 0.1
        expected = np.mean(
            (1.0 - cos(q, p)) + np.maximum(cos(q, n) - margin, 0.0)
        )
        loss, aux = cosine_embedding_loss(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(n), margin=margin
        )
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
        np.testing.assert_allclose(
            float(aux["pos_similarity"]), np.mean(cos(q, p)), rtol=1e-5
        )

    def test_contrastive_is_triplet_alias(self, np_rng):
        q = jnp.asarray(np_rng.normal(size=(3, 4)).astype(np.float32))
        p = jnp.asarray(np_rng.normal(size=(3, 4)).astype(np.float32))
        n = jnp.asarray(np_rng.normal(size=(3, 4)).astype(np.float32))
        a, _ = build_loss("contrastive", margin=0.3).fn(q, p, n)
        b, _ = contrastive_triplet_loss(q, p, n, margin=0.3)
        np.testing.assert_allclose(float(a), float(b))

    def test_cosine_loss_registry_arity(self):
        assert build_loss("cosine").arity == "triplet"

    def test_zero_vector_rows_give_finite_grads(self):
        """The _safe_norm fix: exactly-zero vectors (all-pad rows) must not
        produce NaN gradients through l2_normalize/cosine_similarity even
        when weight-masked (0 * NaN = NaN in reverse-mode)."""
        q = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
        p = jnp.asarray([[0.5, 0.5], [0.0, 0.0]])
        n = jnp.asarray([[0.1, 0.9], [0.0, 0.0]])
        w = jnp.asarray([1.0, 0.0])

        def loss_of(qq):
            return contrastive_triplet_loss(qq, p, n, w)[0]

        g = jax.grad(loss_of)(q)
        assert np.all(np.isfinite(np.asarray(g)))
