"""Fixture-driven tests for the root orchestration scripts.

The reference's de-facto integration suite is tiny-config smoke runs
(/root/reference/configs/test_small.yml via train.py — SURVEY.md §4); here
the equivalent runs offline inside pytest: root ``train.py`` (success and
failure paths, group metadata), ``train_with_msmarco.py`` end-to-end from a
committed MS MARCO-shaped fixture parquet, and ``generate_and_train.py``.
All shapes are tiny and everything runs on the virtual CPU platform.
"""

import json
from pathlib import Path

import pandas as pd
import pytest
import yaml

import generate_and_train
import train as train_cli
import train_with_msmarco as msmarco_cli
from twotowers_tpu.data.factory import readers

FIXTURE = Path(__file__).parent / "fixtures" / "msmarco_raw.parquet"


@pytest.fixture
def tiny_triplets(tmp_path):
    """A 24-row triplets parquet small enough for a 2-epoch CPU run."""
    rows = []
    for i in range(24):
        rows.append({
            "q_text": f"what is item {i} about",
            "d_pos_text": f"item {i} is a document about topic {i % 4}",
            "d_neg_text": f"unrelated text number {23 - i} on something else",
        })
    path = tmp_path / "triplets.parquet"
    pd.DataFrame(rows).to_parquet(path)
    return path


@pytest.fixture
def tiny_config(tmp_path, tiny_triplets):
    config = {
        "data": str(tiny_triplets),
        "tokeniser": {"type": "char", "max_len": 24},
        "embedding": {"type": "lookup", "embedding_dim": 16},
        "encoder": {"arch": "mean", "hidden_dim": 16, "tied_weights": True},
        "loss": {"type": "triplet", "margin": 0.2},
        "batch_size": 8,
        "epochs": 2,
        "use_wandb": False,
        "checkpoint_dir": str(tmp_path / "ckpt"),
    }
    path = tmp_path / "tiny.yml"
    path.write_text(yaml.safe_dump(config))
    return path


@pytest.fixture
def data_dirs(tmp_path, monkeypatch):
    """Point the factory's data tree into tmp so tests never write data/."""
    root = tmp_path / "data"
    monkeypatch.setattr(readers, "DATA_DIR", root)
    monkeypatch.setattr(readers, "RAW_DATA_DIR", root / "raw")
    monkeypatch.setattr(readers, "PROCESSED_DATA_DIR", root / "processed")
    monkeypatch.setattr(readers, "RAW_PARQUET_DIR", root / "raw" / "parquet")
    return root


class TestTrainRunner:
    """Root train.py — reference train.py:72-221 semantics."""

    def test_run_experiment_success(self, tiny_config, tmp_path):
        summary = train_cli.run_experiment(
            str(tiny_config), log_dir=str(tmp_path / "logs"))
        assert summary["success"] is True
        assert summary["num_triplets"] == 24
        assert summary["vocab_size"] > 4
        assert summary["duration_s"] > 0
        assert "jax_backend" in summary["hardware"]

        run_dirs = list((tmp_path / "logs").iterdir())
        assert len(run_dirs) == 1
        run_dir = run_dirs[0]
        on_disk = json.loads((run_dir / "summary.json").read_text())
        assert on_disk["success"] is True
        resolved = yaml.safe_load((run_dir / "resolved_config.yml").read_text())
        assert resolved["batch_size"] == 8
        assert (run_dir / "train.log").exists()

    def test_run_experiment_failure_path(self, tiny_config, tmp_path):
        """A broken config must produce success=false + error, not a crash."""
        broken = yaml.safe_load(tiny_config.read_text())
        broken["data"] = str(tmp_path / "does_not_exist.parquet")
        bad_path = tmp_path / "broken.yml"
        bad_path.write_text(yaml.safe_dump(broken))

        summary = train_cli.run_experiment(
            str(bad_path), log_dir=str(tmp_path / "logs"))
        assert summary["success"] is False
        assert "does_not_exist" in summary["error"]
        on_disk = json.loads(
            next((tmp_path / "logs").glob("*/summary.json")).read_text())
        assert on_disk["success"] is False

    def test_main_multi_config_group_metadata(self, tiny_config, tmp_path):
        log_dir = tmp_path / "logs"
        rc = train_cli.main([
            "--configs", str(tiny_config), str(tiny_config),
            "--log_dir", str(log_dir), "--epochs", "1",
        ])
        assert rc == 0
        group = json.loads(
            next(log_dir.glob("experiment_group_*.json")).read_text())
        assert group["total"] == 2 and group["succeeded"] == 2
        # the --epochs override must reach the resolved config
        resolved = yaml.safe_load(
            next(log_dir.glob("tiny_*/resolved_config.yml")).read_text())
        assert resolved["epochs"] == 1

    def test_main_nonzero_exit_on_failure(self, tiny_config, tmp_path):
        broken = yaml.safe_load(tiny_config.read_text())
        broken["data"] = str(tmp_path / "missing.parquet")
        bad_path = tmp_path / "broken.yml"
        bad_path.write_text(yaml.safe_dump(broken))
        rc = train_cli.main(
            ["--config", str(bad_path), "--log_dir", str(tmp_path / "logs")])
        assert rc == 1


class TestMsMarcoPipeline:
    """train_with_msmarco.py offline via --input_parquet (the committed
    MS MARCO-shaped fixture) — reference train_with_msmarco.py:121-513."""

    def test_run_experiment_end_to_end(self, tmp_path, data_dirs, monkeypatch):
        config = {
            "tokeniser": {"type": "char", "max_len": 32},
            "embedding": {"type": "lookup", "embedding_dim": 16},
            "encoder": {"arch": "mean", "hidden_dim": 16, "tied_weights": True},
            "loss": {"type": "triplet", "margin": 0.2},
            "batch_size": 16,
            "epochs": 1,
            "use_wandb": False,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        config_path = tmp_path / "msmarco_tiny.yml"
        config_path.write_text(yaml.safe_dump(config))

        summary = msmarco_cli.run_experiment(
            split="train", preset_path="presets/classic.yml", samples=120,
            epochs=1, batch_size=16, config_path=str(config_path),
            log_dir=str(tmp_path / "logs"), input_parquet=str(FIXTURE))
        assert summary["success"] is True, summary.get("error")
        assert summary["num_triplets"] == 120
        assert summary["preset"] == "classic"

        run_dir = next((tmp_path / "logs").iterdir())
        ir = json.loads((run_dir / "ir_metrics.json").read_text())
        assert "mrr" in ir and 0.0 <= ir["mrr"] <= 1.0
        assert any(k.startswith("precision@") for k in ir)
        # genealogy sidecar rides next to the triplets parquet
        genealogy_files = list(
            (data_dirs / "processed").glob("*.genealogy.json"))
        assert len(genealogy_files) == 1
        genealogy = json.loads(genealogy_files[0].read_text())
        fixture_rows = len(pd.read_parquet(FIXTURE))
        assert genealogy["pipeline"][0]["rows"] == fixture_rows
        assert genealogy["preset"]["positive_selector"] == "classic"

    def test_fuzzy_preset_recovery(self):
        assert msmarco_cli.find_preset_file("classic").endswith("classic.yml")
        assert msmarco_cli.find_preset_file(
            "clasic.yml").endswith("classic.yml")  # typo -> closest match
        with pytest.raises(FileNotFoundError):
            msmarco_cli.find_preset_file("zzz_nothing_like_this")

    def test_main_matrix_and_group_json(self, tmp_path, data_dirs):
        config = {
            "tokeniser": {"type": "char", "max_len": 24},
            "embedding": {"type": "lookup", "embedding_dim": 8},
            "encoder": {"arch": "mean", "hidden_dim": 8, "tied_weights": True},
            "loss": {"type": "triplet", "margin": 0.2},
            "batch_size": 16, "epochs": 1, "use_wandb": False,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        config_path = tmp_path / "cfg.yml"
        config_path.write_text(yaml.safe_dump(config))
        log_dir = tmp_path / "logs"
        rc = msmarco_cli.main([
            "--presets", "presets/classic.yml", "presets/multi_positive.yml",
            "--samples", "60", "--epochs", "1",
            "--config", str(config_path), "--log_dir", str(log_dir),
            "--input_parquet", str(FIXTURE),
        ])
        assert rc == 0
        group = json.loads(
            next(log_dir.glob("msmarco_group_*.json")).read_text())
        assert len(group["experiments"]) == 2
        assert all(e["success"] for e in group["experiments"])


class TestGenerateAndTrain:
    """generate_and_train.py — reference generate_and_train.py:26-123."""

    def test_end_to_end(self, tmp_path, data_dirs, monkeypatch):
        config = {
            "tokeniser": {"type": "char", "max_len": 24},
            "embedding": {"type": "lookup", "embedding_dim": 8},
            "encoder": {"arch": "mean", "hidden_dim": 8, "tied_weights": True},
            "loss": {"type": "triplet", "margin": 0.2},
            "batch_size": 16, "epochs": 1, "use_wandb": False,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        config_path = tmp_path / "cfg.yml"
        config_path.write_text(yaml.safe_dump(config))

        rc = generate_and_train.main([
            "--num_pairs", "30", "--expand", "10",
            "--config", str(config_path),
            "--output", str(tmp_path / "synthetic_triplets.parquet"),
        ])
        assert rc == 0
        assert (tmp_path / "synthetic_triplets.parquet").exists()
        df = pd.read_parquet(tmp_path / "synthetic_triplets.parquet")
        assert set(df.columns) == {"q_text", "d_pos_text", "d_neg_text"}
        assert len(df) > 0
