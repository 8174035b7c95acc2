"""Integration tests for the train step, loop, checkpointing, and resume."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from twotowers_tpu.data.factory.synthetic import (
    generate_synthetic_pairs,
    write_triplets_parquet,
)
from twotowers_tpu.train import (
    build_optimizer,
    build_pipeline,
    create_train_state,
    evaluate,
    latest_checkpoint,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    save_checkpoint,
    train_epoch,
    train_model,
)
from twotowers_tpu.train.loop import MetricLogger


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    df = generate_synthetic_pairs(num_pairs=24, negatives_per_query=1, seed=0)
    return str(write_triplets_parquet(df, str(tmp / "triplets.parquet")))


def _config(data_path, tmp_path, **overrides):
    cfg = {
        "data": data_path,
        "checkpoint_dir": str(tmp_path / "ckpts"),
        "log_dir": str(tmp_path / "logs"),
        "tokeniser": {"type": "char", "max_len": 32},
        "embedding": {"type": "lookup", "embedding_dim": 16},
        "encoder": {"arch": "mean", "hidden_dim": 32, "tied_weights": True},
        "loss": {"type": "triplet", "margin": 0.2},
        "optimizer": {"type": "adamw", "lr": 0.01},
        "batch_size": 8,
        "epochs": 2,
        "use_wandb": False,
    }
    cfg.update(overrides)
    return cfg


class TestOptim:
    def test_builders(self):
        for kind in ("adamw", "adam", "sgd", "bogus"):
            tx = build_optimizer({"optimizer": {"type": kind, "lr": 0.1}})
            assert hasattr(tx, "update")

    def test_grad_clip_chain(self):
        tx = build_optimizer({"optimizer": {"type": "adamw", "lr": 0.1,
                                            "grad_clip_norm": 1.0}})
        assert hasattr(tx, "update")


class TestTrainStep:
    def test_loss_decreases(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path)
        pipe = build_pipeline(cfg)
        step = make_train_step(pipe.spec, pipe.loss_def, pipe.optimizer)
        state = create_train_state(pipe.params, pipe.optimizer)
        q, p, n = (jnp.asarray(a[:8]) for a in pipe.dataset.arrays())
        w = jnp.ones(8, jnp.float32)
        losses = []
        for _ in range(20):
            state, metrics = step(state, q, p, n, w)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 20

    def test_metrics_present_and_finite(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path)
        pipe = build_pipeline(cfg)
        step = make_train_step(pipe.spec, pipe.loss_def, pipe.optimizer)
        state = create_train_state(pipe.params, pipe.optimizer)
        q, p, n = (jnp.asarray(a[:8]) for a in pipe.dataset.arrays())
        _, metrics = step(state, q, p, n, jnp.ones(8, jnp.float32))
        for key in ("loss", "pos_similarity", "neg_similarity",
                    "similarity_diff", "grad_norm"):
            assert np.isfinite(float(metrics[key])), key

    def test_in_batch_loss_arity(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path, loss={"type": "in_batch",
                                                     "temperature": 0.1})
        pipe = build_pipeline(cfg)
        assert pipe.loss_def.arity == "pair"
        step = make_train_step(pipe.spec, pipe.loss_def, pipe.optimizer)
        state = create_train_state(pipe.params, pipe.optimizer)
        q, p, _ = (jnp.asarray(a[:8]) for a in pipe.dataset.arrays())
        state, metrics = step(state, q, p, None, jnp.ones(8, jnp.float32))
        assert np.isfinite(float(metrics["loss"]))

    def test_multi_neg_loss_arity(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path,
                      loss={"type": "multiple_negatives", "temperature": 0.1})
        pipe = build_pipeline(cfg)
        step = make_train_step(pipe.spec, pipe.loss_def, pipe.optimizer)
        state = create_train_state(pipe.params, pipe.optimizer)
        q, p, n = (jnp.asarray(a[:8]) for a in pipe.dataset.arrays())
        negs = jnp.stack([n, n], axis=1)  # (B, 2, L)
        state, metrics = step(state, q, p, negs, jnp.ones(8, jnp.float32))
        assert np.isfinite(float(metrics["loss"]))

    def test_eval_step_no_state_change(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path)
        pipe = build_pipeline(cfg)
        eval_step = make_eval_step(pipe.spec, pipe.loss_def)
        q, p, n = (jnp.asarray(a[:8]) for a in pipe.dataset.arrays())
        m1 = eval_step(pipe.params, q, p, n, jnp.ones(8, jnp.float32))
        m2 = eval_step(pipe.params, q, p, n, jnp.ones(8, jnp.float32))
        assert float(m1["loss"]) == float(m2["loss"])


class TestCheckpoint:
    def test_save_load_roundtrip(self, rng, tmp_path):
        tree = {"params": {"w": jax.random.normal(rng, (4, 4))},
                "opt_state": {"count": jnp.zeros((), jnp.int32)}}
        path = save_checkpoint(
            tree, str(tmp_path), tokenizer_state={"type": "char"},
            config={"x": 1}, epoch=3, loss=0.5,
        )
        template = jax.tree_util.tree_map(jnp.zeros_like, tree)
        restored, meta = load_checkpoint(path, template)
        np.testing.assert_allclose(restored["params"]["w"], tree["params"]["w"])
        assert meta["epoch"] == 3
        assert meta["loss"] == 0.5
        assert meta["tokenizer"]["type"] == "char"

    def test_best_model_copy(self, rng, tmp_path):
        tree = {"params": {"w": jnp.ones((2,))}}
        save_checkpoint(tree, str(tmp_path), save_best=True)
        assert (tmp_path / "best_model" / "meta.json").exists()

    def test_latest_checkpoint(self, rng, tmp_path):
        tree = {"params": {"w": jnp.ones((2,))}}
        save_checkpoint(tree, str(tmp_path), checkpoint_name="a_ck1", epoch=1)
        save_checkpoint(tree, str(tmp_path), checkpoint_name="b_ck2", epoch=2)
        assert latest_checkpoint(str(tmp_path)).endswith("b_ck2")
        assert latest_checkpoint(str(tmp_path / "nope")) is None


class TestTrainLoop:
    def test_train_model_end_to_end(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path)
        state, pipe = train_model(cfg)
        assert int(state.step) > 0
        # best checkpoint exists and metadata carries tokenizer + config
        best = tmp_path / "ckpts" / "best_model"
        assert best.exists()
        import json

        meta = json.loads((best / "meta.json").read_text())
        assert meta["tokenizer"]["type"] == "char"
        assert meta["config"]["batch_size"] == 8
        # metrics JSONL written with the reference metric names
        logs = list((tmp_path / "logs").glob("*_metrics.jsonl"))
        assert logs
        lines = [l for l in logs[0].read_text().splitlines() if l]
        import json as j

        records = [j.loads(l) for l in lines]
        batch_keys = {k for r in records for k in r}
        for expected in ("train/batch_loss", "train/pos_similarity",
                         "performance/samples_per_second", "train/epoch_loss",
                         "gradients/total_norm"):
            assert expected in batch_keys, expected

    def test_epoch_loss_decreases_over_training(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path, epochs=1)
        pipe = build_pipeline(cfg)
        step = make_train_step(pipe.spec, pipe.loss_def, pipe.optimizer)
        state = create_train_state(pipe.params, pipe.optimizer)
        state, m1 = train_epoch(step, state, pipe, 8, epoch=1, seed=0)
        for _ in range(3):
            state, m2 = train_epoch(step, state, pipe, 8, epoch=2, seed=0)
        assert m2["loss"] < m1["loss"]

    def test_resume_from_checkpoint(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path, epochs=1)
        state1, _ = train_model(cfg)
        cfg_resume = dict(cfg)
        cfg_resume["epochs"] = 2
        cfg_resume["resume"] = "latest"
        state2, _ = train_model(cfg_resume)
        # resumed training continued the step counter past the first run
        assert int(state2.step) > int(state1.step)

    def test_evaluate_weighted_mean(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path)
        pipe = build_pipeline(cfg)
        eval_step = make_eval_step(pipe.spec, pipe.loss_def)
        metrics = evaluate(eval_step, pipe.params, pipe, batch_size=8)
        assert np.isfinite(metrics["loss"])
        # padding must not skew the mean: different batch sizes, same result
        metrics7 = evaluate(eval_step, pipe.params, pipe, batch_size=7)
        np.testing.assert_allclose(metrics["loss"], metrics7["loss"], rtol=1e-4)


class TestMeshConfigTraining:
    def test_train_model_with_mesh_config(self, small_parquet, tmp_path):
        """Config-driven sharded training runs end-to-end on the CPU mesh."""
        cfg = _config(small_parquet, tmp_path,
                      loss={"type": "in_batch", "temperature": 0.1},
                      mesh={"data": 4, "model": 2})
        state, pipe = train_model(cfg)
        assert int(state.step) > 0
        from jax.sharding import PartitionSpec as P

        assert state.params["embedding"]["table"].sharding.spec == P("model", None)

    def test_mesh_and_single_device_losses_close(self, small_parquet, tmp_path):
        cfg_single = _config(small_parquet, tmp_path, epochs=1)
        cfg_mesh = _config(small_parquet, tmp_path / "m", epochs=1,
                           mesh={"data": 2, "model": 1})
        s1, _ = train_model(cfg_single)
        s2, _ = train_model(cfg_mesh)
        assert int(s1.step) == int(s2.step)


class TestDeterminism:
    def test_same_seed_same_loss(self, small_parquet, tmp_path):
        cfg = _config(small_parquet, tmp_path, epochs=1)
        pipe_a = build_pipeline(cfg, seed=7)
        pipe_b = build_pipeline(cfg, seed=7)
        step_a = make_train_step(pipe_a.spec, pipe_a.loss_def, pipe_a.optimizer)
        step_b = make_train_step(pipe_b.spec, pipe_b.loss_def, pipe_b.optimizer)
        sa = create_train_state(pipe_a.params, pipe_a.optimizer)
        sb = create_train_state(pipe_b.params, pipe_b.optimizer)
        import jax.numpy as jnp

        q, p, n = (jnp.asarray(a[:8]) for a in pipe_a.dataset.arrays())
        w = jnp.ones(8, jnp.float32)
        for _ in range(3):
            sa, ma = step_a(sa, q, p, n, w)
            sb, mb = step_b(sb, q, p, n, w)
        assert float(ma["loss"]) == float(mb["loss"])


class TestWordModelEndToEnd:
    def test_word_tokenizer_pretrained_avg_pool(self, small_parquet, tmp_path):
        """The word2vec_skipgram.yml-shaped path: word tokenizer, frozen
        pretrained-fallback embeddings, avg_pool tower with projection."""
        cfg = _config(
            small_parquet, tmp_path,
            tokeniser={"type": "word", "max_len": 16, "lowercase": True,
                       "strip_punctuation": True},
            embedding={"type": "pretrained", "embedding_dim": 24,
                       "trainable": False,
                       "source": "not-a-real-source-offline"},
            encoder={"arch": "avg_pool", "hidden_dim": 12,
                     "tied_weights": True, "dropout": 0.1},
            loss={"type": "triplet", "margin": 0.3},
            epochs=1,
        )
        state, pipe = train_model(cfg)
        assert int(state.step) > 0
        # frozen table unchanged after training (compare against a fresh
        # re-init: the original buffers were donated by the train step, and
        # the hash-fallback init is deterministic)
        from twotowers_tpu.models.embeddings import init_embedding

        fresh = init_embedding(jax.random.PRNGKey(0), pipe.spec.embedding)
        np.testing.assert_allclose(
            np.asarray(state.params["embedding"]["table"]),
            np.asarray(fresh["table"]),
        )
