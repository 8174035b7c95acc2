"""Pallas kernel A/B tests against the XLA reference paths (interpret mode).

On the CPU test platform the kernels run through the Pallas interpreter, so
these tests prove kernel *semantics*; Mosaic compilation is exercised on the
real chip by bench.py and the index engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twotowers_tpu.kernels.pallas_topk import score_topk_pallas
from twotowers_tpu.models import EmbeddingSpec, TowerSpec, TwoTowerSpec, init_two_tower
from twotowers_tpu.models.towers import encode
from twotowers_tpu.ops.core import masked_mean_pool
from twotowers_tpu.ops.topk_score import score_topk_xla



class TestTopKKernel:
    @pytest.mark.parametrize("n,q,dim,k,tile", [
        (512, 4, 32, 5, 128),
        (1024, 16, 64, 10, 256),
        (700, 3, 16, 7, 128),   # n not a multiple of tile
    ])
    def test_matches_xla(self, np_rng, n, q, dim, k, tile):
        docs = np_rng.normal(size=(n, dim)).astype(np.float32)
        queries = np_rng.normal(size=(q, dim)).astype(np.float32)
        got = score_topk_pallas(
            jnp.asarray(docs), jnp.asarray(queries), k, n,
            tile_n=tile, interpret=True,
        )
        assert got is not None
        got_s, got_i = got
        want_s, want_i = score_topk_xla(jnp.asarray(docs), jnp.asarray(queries), k)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_n_docs_masking(self, np_rng):
        docs = np_rng.normal(size=(512, 16)).astype(np.float32)
        docs[300:] = 50.0  # rows past n_docs carry huge scores
        queries = np_rng.normal(size=(2, 16)).astype(np.float32)
        got = score_topk_pallas(
            jnp.asarray(docs), jnp.asarray(queries), 5, 300,
            tile_n=128, interpret=True,
        )
        _, idx = got
        assert np.asarray(idx).max() < 300

    def test_declines_small_corpus(self, np_rng):
        docs = jnp.asarray(np_rng.normal(size=(100, 8)).astype(np.float32))
        queries = jnp.asarray(np_rng.normal(size=(2, 8)).astype(np.float32))
        assert score_topk_pallas(docs, queries, 5, tile_n=2048) is None

    def test_tie_break_matches_xla_first_occurrence(self):
        docs = np.zeros((512, 8), np.float32)
        docs[:, 0] = 1.0  # every doc scores identically
        queries = np.zeros((1, 8), np.float32)
        queries[0, 0] = 1.0
        got = score_topk_pallas(
            jnp.asarray(docs), jnp.asarray(queries), 4, 512,
            tile_n=128, interpret=True,
        )
        _, idx = got
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])

    def test_registered_in_dispatcher(self, np_rng):
        import twotowers_tpu.kernels  # noqa: F401  (registers the impl)
        from twotowers_tpu.ops.topk_score import _pallas_impl

        assert _pallas_impl is not None


class TestScatterAddKernel:
    """kernels/pallas_scatter_add.py — embedding-gradient scatter (interpret)."""

    def _want(self, g, ids, vocab):
        return np.asarray(
            jnp.zeros((vocab, g.shape[-1]), jnp.float32)
            .at[jnp.asarray(ids)].add(jnp.asarray(g, jnp.float32)))

    @pytest.mark.parametrize("vocab,dim,n", [
        (640, 64, 4096),      # single block, native half-lane rows
        (640, 64, 5000),      # n not a tile multiple -> padded ids/g
        (130, 32, 4096),      # dim pads up to a full lane
        (1024, 128, 4096),    # full-lane rows
        (30522 % 997, 64, 4096),  # vocab 622 not 8-aligned -> block rounds up
        (30522, 64, 4096),    # BERT-style non-8-aligned vocab, single block
    ])
    def test_matches_xla_scatter(self, np_rng, vocab, dim, n):
        from twotowers_tpu.kernels.pallas_scatter_add import scatter_add_rows

        ids = np_rng.integers(0, vocab, size=(n,)).astype(np.int32)
        g = np_rng.normal(size=(n, dim)).astype(np.float32)
        got = scatter_add_rows(jnp.asarray(g), jnp.asarray(ids), vocab,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), self._want(g, ids, vocab),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_cotangents(self, np_rng):
        from twotowers_tpu.kernels.pallas_scatter_add import scatter_add_rows

        ids = np_rng.integers(0, 640, size=(4096,)).astype(np.int32)
        g = np_rng.normal(size=(4096, 64)).astype(np.float32)
        g_bf16 = jnp.asarray(g).astype(jnp.bfloat16)
        got = scatter_add_rows(g_bf16, jnp.asarray(ids), 640, interpret=True)
        want = self._want(np.asarray(g_bf16, np.float32), ids, 640)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_multi_block_path(self, np_rng, monkeypatch):
        """Tables above the VMEM budget split into vocab blocks."""
        from twotowers_tpu.kernels import pallas_scatter_add as mod

        monkeypatch.setattr(mod, "VMEM_ACC_BUDGET", 256 * 64 * 4)
        ids = np_rng.integers(0, 700, size=(8192,)).astype(np.int32)
        g = np_rng.normal(size=(8192, 64)).astype(np.float32)
        got = mod.scatter_add_rows(jnp.asarray(g), jnp.asarray(ids), 700,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), self._want(g, ids, 700),
                                   rtol=1e-5, atol=1e-5)

    def test_duplicate_heavy_ids(self, np_rng):
        """Zipf-like collisions inside unroll groups must still accumulate."""
        from twotowers_tpu.kernels.pallas_scatter_add import scatter_add_rows

        ids = np.minimum(
            np_rng.geometric(0.3, size=(4096,)) - 1, 639).astype(np.int32)
        g = np_rng.normal(size=(4096, 64)).astype(np.float32)
        got = scatter_add_rows(jnp.asarray(g), jnp.asarray(ids), 640,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), self._want(g, ids, 640),
                                   rtol=1e-4, atol=1e-4)

    def test_rejects_bad_tile_n(self, np_rng):
        """tile_n not divisible by UNROLL would silently drop tail rows."""
        from twotowers_tpu.kernels.pallas_scatter_add import scatter_add_rows

        ids = jnp.zeros((16,), jnp.int32)
        g = jnp.zeros((16, 64), jnp.float32)
        with pytest.raises(ValueError, match="multiple of 8"):
            scatter_add_rows(g, ids, 64, tile_n=12, interpret=True)
        with pytest.raises(ValueError, match="positive"):
            scatter_add_rows(g, ids, 64, tile_n=0, interpret=True)

    def test_bf16_table_grad_dtype(self, np_rng):
        """A bf16 param table must receive a bf16 cotangent (custom_vjp
        enforces cotangent dtype == primal dtype)."""
        from twotowers_tpu.kernels.pallas_scatter_add import _take_scatter_grad

        ids = jnp.asarray(np_rng.integers(0, 640, size=(16, 12)), jnp.int32)
        table = jnp.asarray(
            np_rng.normal(size=(640, 64)), jnp.float32).astype(jnp.bfloat16)
        g = jax.grad(
            lambda tab: jnp.sum(_take_scatter_grad(tab, ids, jnp.bfloat16)
                                .astype(jnp.float32)))(table)
        assert g.dtype == jnp.bfloat16
        want = jax.grad(
            lambda tab: jnp.sum(jnp.take(tab, ids, axis=0)
                                .astype(jnp.float32)))(table)
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-2, atol=1e-2)

    def test_custom_vjp_grad_matches_take(self, np_rng):
        """The embed_ids fast-grad lookup == plain take in value and grad."""
        from twotowers_tpu.kernels import pallas_scatter_add as mod
        from twotowers_tpu.kernels.pallas_scatter_add import _take_scatter_grad

        ids = jnp.asarray(np_rng.integers(0, 640, size=(16, 12)), jnp.int32)
        table = jnp.asarray(np_rng.normal(size=(640, 64)), jnp.float32)

        def loss_fast(tab):
            return jnp.sum(jnp.sin(_take_scatter_grad(tab, ids, jnp.float32)))

        def loss_take(tab):
            return jnp.sum(jnp.sin(jnp.take(tab, ids, axis=0)))

        v1, g1 = jax.value_and_grad(loss_fast)(table)
        v2, g2 = jax.value_and_grad(loss_take)(table)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)
