"""Metric logging with the reference's W&B metric-name contract.

The reference streams per-batch scalars to W&B (train/batch_loss,
train/pos_similarity, train/neg_similarity, train/similarity_diff,
performance/*, gradients/total_norm — /root/reference/twotower/train.py:171-197)
and per-epoch scalars (train/epoch_loss etc., train.py:447-453). Those names
are the observability contract (SURVEY.md §5) and are preserved here.

W&B is optional: when the package is missing or ``use_wandb`` is false, the
same records are appended to a local JSONL file so runs remain inspectable
and the reports layer can read them offline.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

from ..utils.logging import get_logger

logger = get_logger("train.metrics")

try:  # gated optional dependency
    import wandb as _wandb
except Exception:  # pragma: no cover - depends on environment
    _wandb = None


class MetricLogger:
    """Logs metric dicts to W&B when available, always to a local JSONL."""

    def __init__(
        self,
        config: Dict[str, Any],
        log_dir: str = "logs",
        run_name: Optional[str] = None,
    ):
        self.enabled_wandb = bool(config.get("use_wandb", False)) and _wandb is not None
        if config.get("use_wandb") and _wandb is None:
            logger.warning("use_wandb=true but wandb is not installed; using JSONL only")
        self._run = None
        wandb_cfg = config.get("wandb", {}) or {}
        self.run_name = run_name or wandb_cfg.get("run_name") or f"run_{int(time.time())}"
        if self.enabled_wandb:  # pragma: no cover - needs wandb
            self._run = _wandb.init(
                project=wandb_cfg.get("project", "two-tower-retrieval"),
                entity=wandb_cfg.get("entity"),
                name=wandb_cfg.get("run_name"),
                tags=wandb_cfg.get("tags"),
                config=config,
            )
        log_path = Path(log_dir)
        log_path.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = log_path / f"{self.run_name}_metrics.jsonl"
        self._file = open(self.jsonl_path, "a")

    def log(self, record: Dict[str, Any]) -> None:
        if self._run is not None:  # pragma: no cover - needs wandb
            self._run.log(record)
        payload = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in record.items()}
        payload["_time"] = time.time()
        self._file.write(json.dumps(payload) + "\n")

    def finish(self) -> None:
        self._file.flush()
        self._file.close()
        if self._run is not None:  # pragma: no cover - needs wandb
            self._run.finish()

    def __enter__(self) -> "MetricLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()
