"""Reusable report sections.

Capability parity with /root/reference/reports/blocks.py:11-303 (training-
dynamics / similarity / performance / gradient / config panel factories).
Each block renders the offline markdown form from a run's metric records;
when ``wandb_workspaces`` is importable the same factories can emit W&B
panel objects for hosted reports (``as_wandb_panels``).
"""

from __future__ import annotations

from typing import Any, Dict, List

import yaml

from .report_utils import series, summarise_series


def _stat_table(title: str, rows: List[tuple]) -> str:
    lines = [f"### {title}", "", "| metric | first | last | min | max | mean |",
             "|---|---|---|---|---|---|"]
    for name, stats in rows:
        if not stats:
            continue
        lines.append(
            f"| {name} | {stats['first']:.4g} | {stats['last']:.4g} | "
            f"{stats['min']:.4g} | {stats['max']:.4g} | {stats['mean']:.4g} |"
        )
    return "\n".join(lines)


def training_dynamics_block(records: List[Dict[str, Any]]) -> str:
    rows = [
        ("train/batch_loss", summarise_series(series(records, "train/batch_loss"))),
        ("train/epoch_loss", summarise_series(series(records, "train/epoch_loss"))),
        ("train/learning_rate", summarise_series(series(records, "train/learning_rate"))),
    ]
    return _stat_table("Training dynamics", rows)


def similarity_block(records: List[Dict[str, Any]]) -> str:
    rows = [
        ("train/pos_similarity", summarise_series(series(records, "train/pos_similarity"))),
        ("train/neg_similarity", summarise_series(series(records, "train/neg_similarity"))),
        ("train/similarity_diff", summarise_series(series(records, "train/similarity_diff"))),
    ]
    return _stat_table("Similarity monitors", rows)


def performance_block(records: List[Dict[str, Any]]) -> str:
    rows = [
        ("performance/batch_time", summarise_series(series(records, "performance/batch_time"))),
        ("performance/samples_per_second",
         summarise_series(series(records, "performance/samples_per_second"))),
        ("train/epoch_time", summarise_series(series(records, "train/epoch_time"))),
    ]
    return _stat_table("Performance", rows)


def gradient_block(records: List[Dict[str, Any]]) -> str:
    rows = [
        ("gradients/total_norm", summarise_series(series(records, "gradients/total_norm"))),
    ]
    return _stat_table("Gradients", rows)


def config_block(config: Dict[str, Any]) -> str:
    return "### Configuration\n\n```yaml\n" + yaml.dump(
        config, default_flow_style=False, sort_keys=False
    ) + "```"


def ir_metrics_block(ir_metrics: Dict[str, float]) -> str:
    lines = ["### IR evaluation", "", "| metric | score |", "|---|---|"]
    for key in sorted(ir_metrics):
        lines.append(f"| {key} | {ir_metrics[key]:.4f} |")
    return "\n".join(lines)


def as_wandb_panels(records: List[Dict[str, Any]]):  # pragma: no cover - needs wandb
    """The same block structure as wandb_workspaces panel grids, when the
    optional dependency exists (reference blocks.py produces these)."""
    try:
        import wandb_workspaces.reports.v2 as wr
    except Exception as exc:
        raise RuntimeError(f"wandb_workspaces not installed: {exc}")
    return [
        wr.PanelGrid(panels=[
            wr.LinePlot(x="train/batch", y=["train/batch_loss"]),
            wr.LinePlot(x="train/batch", y=["train/pos_similarity",
                                            "train/neg_similarity"]),
            wr.LinePlot(x="train/batch", y=["performance/samples_per_second"]),
            wr.LinePlot(x="train/batch", y=["gradients/total_norm"]),
        ])
    ]
