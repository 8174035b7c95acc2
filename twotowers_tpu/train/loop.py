"""The training loop: config -> trained model, with checkpointing and resume.

Capability parity with /root/reference/twotower/train.py:373-517
(``train_model``: pipeline build, epoch loop, per-batch metrics, best-loss
checkpointing, optional Hub push) plus the resume capability the reference
lacks. TPU-first structure: the hot path is one donated jit step per batch
over a host-side prefetching iterator; per-batch host work is only metric
bookkeeping. Metric scalars are fetched with a one-step delay so the device
never stalls waiting for the host (jax dispatch is async).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..data.batching import Batch, iterate_batches, num_batches, prefetch_to_device
from ..utils.logging import Timer, get_logger
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .metrics import MetricLogger
from .pipeline import Pipeline, build_pipeline
from .step import TrainState, create_train_state, make_eval_step, make_train_step

logger = get_logger("train.loop")

DEFAULT_EPOCHS = 3
DEFAULT_BATCH_SIZE = 256


def _negatives_for_arity(batch: Batch, arity: str):
    if arity == "pair":
        return None
    negs = batch.negatives
    if negs is None:
        raise ValueError(f"Loss arity {arity!r} needs negatives in the data")
    if arity == "multi_neg" and negs.ndim == 2:
        negs = negs[:, None, :]  # single negative per row -> N=1 group
    return negs


def train_epoch(
    train_step,
    state: TrainState,
    pipeline: Pipeline,
    batch_size: int,
    *,
    epoch: int,
    seed: int,
    metric_logger: Optional[MetricLogger] = None,
    batch_placer=None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Run one epoch; returns (state, epoch metrics).

    The epoch loss is the weighted-by-real-samples mean of batch losses,
    matching the reference's ``total_loss += batch_loss * len(queries)``
    accounting (train.py:154-156, 200).
    """
    arity = pipeline.loss_def.arity
    arrays = pipeline.dataset.arrays()
    timer = Timer(f"epoch{epoch}")
    timer.start()

    total_loss = 0.0
    sample_count = 0
    batch_times = []
    # Metric-semantics delta vs the reference (docs/training.md "Metric
    # semantics"): performance/batch_time here is host wall-clock from batch
    # assembly to the NEXT step's dispatch (the device readback is drained one
    # step late so the device never idles waiting on the host), and there are
    # no separate forward/backward timings because the whole step is one fused
    # XLA program (reference logs them split: twotower/train.py:159-181).
    pending = None  # (metrics, num_real, batch_start) fetched one step late

    def drain(pending, batch_idx):
        nonlocal total_loss, sample_count
        metrics, real, batch_start = pending
        host = {k: float(v) for k, v in metrics.items()}
        batch_time = time.time() - batch_start
        batch_times.append(batch_time)
        total_loss += host["loss"] * real
        sample_count += real
        if metric_logger is not None:
            record = {
                "train/batch": batch_idx,
                "train/batch_loss": host["loss"],
                "train/pos_similarity": host["pos_similarity"],
                "train/neg_similarity": host["neg_similarity"],
                "train/similarity_diff": host["similarity_diff"],
                "performance/batch_time": batch_time,
                "performance/samples_per_second": real / max(batch_time, 1e-9),
                "gradients/total_norm": host["grad_norm"],
                "train/grad_norm": host["grad_norm"],
            }
            metric_logger.log(record)
        return host

    if batch_placer is None:
        batch_iter = prefetch_to_device(
            iterate_batches(arrays, batch_size, shuffle=True, seed=seed + epoch)
        )
    else:
        batch_iter = (
            batch_placer(b)
            for b in iterate_batches(arrays, batch_size, shuffle=True,
                                     seed=seed + epoch)
        )
    last_host = None
    for batch_idx, batch in enumerate(batch_iter):
        batch_start = time.time()
        state, metrics = train_step(
            state, batch.queries, batch.positives,
            _negatives_for_arity(batch, arity), batch.weights,
        )
        if pending is not None:
            last_host = drain(pending, batch_idx - 1)
        pending = (metrics, batch.num_real, batch_start)
    if pending is not None:
        last_host = drain(pending, num_batches(len(pipeline.dataset), batch_size) - 1)

    epoch_time = timer.stop()
    epoch_loss = total_loss / sample_count if sample_count else float("inf")
    metrics_out = {
        "loss": epoch_loss,
        "time": epoch_time,
        "avg_batch_time": float(np.mean(batch_times)) if batch_times else 0.0,
        "samples_per_second": sample_count / max(epoch_time, 1e-9),
    }
    logger.info(
        "Epoch %d: loss=%.6f, %.1f samples/s (%.2fs)",
        epoch, epoch_loss, metrics_out["samples_per_second"], epoch_time,
    )
    if last_host is not None:
        logger.info(
            "  last batch: pos_sim=%.4f neg_sim=%.4f diff=%.4f",
            last_host["pos_similarity"], last_host["neg_similarity"],
            last_host["similarity_diff"],
        )
    return state, metrics_out


def evaluate(
    eval_step, params, pipeline: Pipeline, batch_size: int,
    dataset=None, batch_placer=None,
) -> Dict[str, float]:
    """Validation pass: weighted-mean loss + similarity stats (no grad).

    ``batch_placer`` routes batches onto a mesh exactly as in training, so
    under ``mesh:`` configs validation runs the sharded eval step on sharded
    batches (required for multi-process; see parallel.make_sharded_eval_step).
    """
    dataset = dataset or pipeline.dataset
    arity = pipeline.loss_def.arity
    totals = {"loss": 0.0, "pos_similarity": 0.0, "neg_similarity": 0.0,
              "similarity_diff": 0.0}
    count = 0
    if batch_placer is None:
        batch_iter = prefetch_to_device(
            iterate_batches(dataset.arrays(), batch_size, shuffle=False))
    else:
        batch_iter = (batch_placer(b) for b in iterate_batches(
            dataset.arrays(), batch_size, shuffle=False))
    for batch in batch_iter:
        metrics = eval_step(
            params, batch.queries, batch.positives,
            _negatives_for_arity(batch, arity), batch.weights,
        )
        real = batch.num_real
        for key in totals:
            totals[key] += float(metrics[key]) * real
        count += real
    return {k: (v / count if count else float("inf")) for k, v in totals.items()}


def train_model(config: Dict[str, Any], *, seed: int = 0) -> Tuple[TrainState, Pipeline]:
    """Train a two-tower model from a config dict; returns (state, pipeline)."""
    epochs = int(config.get("epochs", DEFAULT_EPOCHS))
    batch_size = int(config.get("batch_size", DEFAULT_BATCH_SIZE))
    checkpoint_dir = config.get("checkpoint_dir", "checkpoints")
    log_dir = config.get("log_dir", "logs")

    pipeline = build_pipeline(config, seed=seed)

    # multi-chip training: `mesh: {data: N, model: M, shard_vocab, global_negatives}`
    # switches to the pjit sharded step; everything downstream is identical.
    mesh_cfg = config.get("mesh") or {}
    batch_placer = None
    if mesh_cfg:
        from ..parallel import (
            create_sharded_train_state,
            make_mesh,
            make_sharded_train_step,
            shard_batch,
        )

        mesh = make_mesh(data=mesh_cfg.get("data"),
                         model=int(mesh_cfg.get("model", 1)))
        train_step = make_sharded_train_step(
            pipeline.spec, pipeline.loss_def, pipeline.optimizer, mesh,
            shard_vocab=bool(mesh_cfg.get("shard_vocab", True)),
            global_negatives=bool(mesh_cfg.get("global_negatives", True)),
        )
        state = create_sharded_train_state(
            pipeline.params, pipeline.optimizer, mesh,
            shard_vocab=bool(mesh_cfg.get("shard_vocab", True)),
            rng=jax.random.PRNGKey(seed),
        )

        def batch_placer(batch: Batch) -> Batch:
            q, p, n, w = shard_batch(
                mesh, batch.queries, batch.positives, batch.negatives,
                batch.weights,
            )
            return Batch(queries=q, positives=p, negatives=n, weights=w,
                         num_real_hint=batch.num_real)

        logger.info("Sharded training over mesh %s", dict(mesh.shape))
    else:
        train_step = make_train_step(pipeline.spec, pipeline.loss_def,
                                     pipeline.optimizer)
        state = create_train_state(pipeline.params, pipeline.optimizer,
                                   jax.random.PRNGKey(seed))

    # optional validation split (new over the reference, whose evaluate()
    # is plumbing only): `val_data: path` enables per-epoch val metrics
    val_dataset = None
    eval_step = None
    if config.get("val_data"):
        from ..data.triplets import TripletDataset

        val_dataset = TripletDataset(
            config["val_data"], pipeline.tokenizer,
            max_length=pipeline.max_length,
        )
        if mesh_cfg:
            from ..parallel import make_sharded_eval_step

            eval_step = make_sharded_eval_step(
                pipeline.spec, pipeline.loss_def, mesh,
                shard_vocab=bool(mesh_cfg.get("shard_vocab", True)),
                global_negatives=bool(mesh_cfg.get("global_negatives", True)),
            )
        else:
            eval_step = make_eval_step(pipeline.spec, pipeline.loss_def)

    # optional jax.profiler trace of the first epoch's steps
    # (`profile: {trace_dir: ..., }` — SURVEY.md §5 tracing parity, TPU-native)
    profile_cfg = config.get("profile", {}) or {}
    profile_dir = profile_cfg.get("trace_dir") if profile_cfg else None

    start_epoch = 1
    if config.get("resume"):
        resume_path = config["resume"]
        if resume_path is True or str(resume_path).lower() == "latest":
            resume_path = latest_checkpoint(checkpoint_dir)
        if resume_path:
            tree, meta = load_checkpoint(
                str(resume_path), {"params": state.params, "opt_state": state.opt_state}
            )
            state = TrainState(
                tree["params"], tree["opt_state"],
                state.step + meta.get("step", 0), state.rng,
            )
            start_epoch = int(meta.get("epoch", 0)) + 1
            logger.info("Resumed from %s at epoch %d", resume_path, start_epoch)
        else:
            logger.info("No checkpoint found to resume from; starting fresh")

    best_loss = float("inf")
    best_path = None
    with MetricLogger(config, log_dir=log_dir) as metric_logger:
        for epoch in range(start_epoch, epochs + 1):
            logger.info("Epoch %d/%d", epoch, epochs)
            profiling = profile_dir and epoch == start_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)
            state, epoch_metrics = train_epoch(
                train_step, state, pipeline, batch_size,
                epoch=epoch, seed=seed, metric_logger=metric_logger,
                batch_placer=batch_placer,
            )
            if profiling:
                jax.profiler.stop_trace()
                logger.info("Wrote profiler trace to %s", profile_dir)
            if val_dataset is not None:
                val_metrics = evaluate(eval_step, state.params, pipeline,
                                       batch_size, dataset=val_dataset,
                                       batch_placer=batch_placer)
                metric_logger.log({
                    "epoch": epoch,
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                })
                logger.info("  val loss=%.6f pos_sim=%.4f",
                            val_metrics["loss"], val_metrics["pos_similarity"])
            lr = (config.get("optimizer", {}) or {}).get(
                "lr", config.get("learning_rate", 1e-3))
            metric_logger.log({
                "epoch": epoch,
                "train/epoch_loss": epoch_metrics["loss"],
                "train/epoch_time": epoch_metrics["time"],
                "train/learning_rate": lr,
                "train/batch_size": batch_size,
                "performance/epoch_samples_per_second": epoch_metrics["samples_per_second"],
            })
            if epoch_metrics["loss"] < best_loss:
                best_loss = epoch_metrics["loss"]
                logger.info("New best model with loss: %.6f", best_loss)
                best_path = save_checkpoint(
                    {"params": state.params, "opt_state": state.opt_state},
                    checkpoint_dir,
                    tokenizer_state=pipeline.tokenizer.state_dict(),
                    config=config,
                    epoch=epoch,
                    step=int(state.step),
                    loss=best_loss,
                )

    logger.info("Training completed. Best loss: %.6f", best_loss)

    hf_config = config.get("huggingface", {}) or {}
    if hf_config.get("push_to_hub") and best_path:
        from ..hub.huggingface import save_and_upload  # gated import

        try:
            save_and_upload(
                checkpoint_path=best_path,
                repo_id=hf_config.get("repo_id", "mlx7-two-tower"),
                private=bool(hf_config.get("private", False)),
            )
        except Exception as exc:  # network/auth soft-fail, as the reference does
            logger.error("Failed to push model to the Hub: %s", exc)

    return state, pipeline
