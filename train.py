#!/usr/bin/env python
"""Experiment runner: train one or many configs, sequentially or in parallel.

Capability parity with /root/reference/train.py:56-357 — single config,
multiple configs, or a directory of configs; per-experiment log files and
resolved-config snapshots; hardware-info capture; experiment-group metadata
JSON; optional process-parallel runs. Parallelism here is the reference's
experiment-level multiprocessing only — chips-level parallelism lives in
``twotowers_tpu.parallel`` (mesh/pjit), not in this runner.

Usage:
    python train.py --config configs/char_tower.yml
    python train.py --configs configs/a.yml configs/b.yml --parallel 2
    python train.py --config_dir configs/sweep/
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import platform
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from twotowers_tpu.utils import load_config, save_config, setup_logging, get_logger

logger = get_logger("cli.train")


def get_hardware_info() -> Dict[str, Any]:
    """Capture host + accelerator info (reference train.py:56-70, TPU-ified)."""
    info: Dict[str, Any] = {
        "platform": platform.platform(),
        "python_version": platform.python_version(),
        "processor": platform.processor(),
        "cpu_count": os.cpu_count(),
    }
    try:
        import jax

        devices = jax.devices()
        info["jax_backend"] = devices[0].platform if devices else "none"
        info["device_count"] = len(devices)
        info["devices"] = [str(d) for d in devices]
    except Exception as exc:  # pragma: no cover
        info["jax_backend"] = f"unavailable ({exc})"
    return info


def run_experiment(config_path: str, log_dir: str = "logs",
                   overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Run one training experiment; returns a summary dict (success flag,
    best loss, timings) and writes log file + resolved-config snapshot."""
    name = Path(config_path).stem
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    run_dir = Path(log_dir) / f"{name}_{timestamp}"
    run_dir.mkdir(parents=True, exist_ok=True)

    setup_logging(log_level=os.environ.get("TWOTOWER_LOG_LEVEL", "INFO"),
                  log_file=str(run_dir / "train.log"))
    summary: Dict[str, Any] = {
        "experiment": name,
        "config_path": str(config_path),
        "started": timestamp,
        "hardware": get_hardware_info(),
    }
    start = time.time()
    try:
        config = load_config(config_path)
        if overrides:
            config.update(overrides)
        config.setdefault("log_dir", str(run_dir))
        save_config(config, str(run_dir / "resolved_config.yml"))

        from twotowers_tpu.train import train_model

        state, pipeline = train_model(config)
        summary["success"] = True
        summary["num_triplets"] = len(pipeline.dataset)
        summary["vocab_size"] = pipeline.dataset.vocab_size
    except Exception as exc:
        logger.exception("Experiment %s failed", name)
        summary["success"] = False
        summary["error"] = str(exc)
    summary["duration_s"] = time.time() - start
    with open(run_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description="Train two-tower models from configs")
    parser.add_argument("--config", help="Path to a single config YAML")
    parser.add_argument("--configs", nargs="+", help="Multiple config YAMLs")
    parser.add_argument("--config_dir", help="Directory of config YAMLs")
    parser.add_argument("--log_dir", default="logs")
    parser.add_argument("--parallel", type=int, default=0,
                        help="Run N experiments in parallel processes (0 = sequential)")
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--log_level", default="INFO",
                        choices=["DEBUG", "INFO", "WARNING", "ERROR"])
    args = parser.parse_args(argv)

    config_paths: List[str] = []
    if args.config:
        config_paths.append(args.config)
    if args.configs:
        config_paths.extend(args.configs)
    if args.config_dir:
        config_paths.extend(
            sorted(str(p) for p in Path(args.config_dir).glob("*.yml"))
        )
    if not config_paths:
        parser.error("Provide --config, --configs or --config_dir")

    os.environ["TWOTOWER_LOG_LEVEL"] = args.log_level
    overrides: Dict[str, Any] = {}
    if args.use_wandb:
        overrides["use_wandb"] = True
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size

    group_dir = Path(args.log_dir)
    group_dir.mkdir(parents=True, exist_ok=True)

    if args.parallel > 1 and len(config_paths) > 1:
        import multiprocessing as mp

        with mp.Pool(args.parallel) as pool:
            summaries = pool.starmap(
                run_experiment,
                [(p, args.log_dir, overrides) for p in config_paths],
            )
    else:
        summaries = [run_experiment(p, args.log_dir, overrides) for p in config_paths]

    group_meta = {
        "experiments": summaries,
        "total": len(summaries),
        "succeeded": sum(1 for s in summaries if s.get("success")),
    }
    group_path = group_dir / f"experiment_group_{int(time.time())}.json"
    with open(group_path, "w") as f:
        json.dump(group_meta, f, indent=2, default=str)
    print(f"{group_meta['succeeded']}/{group_meta['total']} experiments succeeded "
          f"(details: {group_path})")
    return 0 if group_meta["succeeded"] == group_meta["total"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
