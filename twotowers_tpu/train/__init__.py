"""Training: pipeline assembly, jit steps, loop, optimizers, checkpointing."""

from .checkpoint import latest_checkpoint, load_checkpoint, load_metadata, save_checkpoint
from .loop import evaluate, train_epoch, train_model
from .metrics import MetricLogger
from .optim import build_optimizer
from .pipeline import Pipeline, build_pipeline, build_tokenizer_from_config
from .step import TrainState, create_train_state, make_eval_step, make_train_step

__all__ = [
    "MetricLogger",
    "Pipeline",
    "TrainState",
    "build_optimizer",
    "build_pipeline",
    "build_tokenizer_from_config",
    "create_train_state",
    "evaluate",
    "latest_checkpoint",
    "load_checkpoint",
    "load_metadata",
    "make_eval_step",
    "make_train_step",
    "save_checkpoint",
    "train_epoch",
    "train_model",
]
