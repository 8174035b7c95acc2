"""Unit tests for the YAML config system (extends + env overrides)."""

import pytest

from twotowers_tpu.utils.config import deep_merge, load_config, parse_env_value


@pytest.fixture
def config_dir(tmp_path):
    (tmp_path / "base.yml").write_text(
        "batch_size: 256\n"
        "learning_rate: 0.001\n"
        "encoder:\n  hidden_dim: 128\n  arch: mean\n"
        "wandb:\n  project: two-tower-retrieval\n"
    )
    (tmp_path / "child.yml").write_text(
        "extends: base.yml\n"
        "batch_size: 32\n"
        "encoder:\n  hidden_dim: 64\n"
    )
    (tmp_path / "grandchild.yml").write_text(
        "extends: child.yml\n"
        "epochs: 1\n"
    )
    return tmp_path


class TestDeepMerge:
    def test_override_wins(self):
        assert deep_merge({"a": 1}, {"a": 2}) == {"a": 2}

    def test_nested_merge(self):
        base = {"enc": {"dim": 128, "arch": "mean"}}
        override = {"enc": {"dim": 64}}
        assert deep_merge(base, override) == {"enc": {"dim": 64, "arch": "mean"}}

    def test_non_dict_replaces_dict(self):
        assert deep_merge({"a": {"b": 1}}, {"a": 5}) == {"a": 5}


class TestParseEnvValue:
    @pytest.mark.parametrize("raw,expected", [
        ("5", 5), ("0.25", 0.25), ("true", True), ("FALSE", False),
        ("yes", True), ("no", False), ("hello", "hello"),
    ])
    def test_typed_parsing(self, raw, expected):
        assert parse_env_value(raw) == expected


class TestLoadConfig:
    def test_plain_load(self, config_dir):
        cfg = load_config(str(config_dir / "base.yml"))
        assert cfg["batch_size"] == 256

    def test_extends_merges(self, config_dir):
        cfg = load_config(str(config_dir / "child.yml"))
        assert cfg["batch_size"] == 32  # overridden
        assert cfg["learning_rate"] == 0.001  # inherited
        assert cfg["encoder"] == {"hidden_dim": 64, "arch": "mean"}  # deep-merged

    def test_extends_chain(self, config_dir):
        cfg = load_config(str(config_dir / "grandchild.yml"))
        assert cfg["epochs"] == 1
        assert cfg["batch_size"] == 32
        assert cfg["wandb"]["project"] == "two-tower-retrieval"

    def test_env_override_flat(self, config_dir, monkeypatch):
        monkeypatch.setenv("TWOTOWER_BATCH_SIZE", "8")
        cfg = load_config(str(config_dir / "base.yml"))
        assert cfg["batch_size"] == 8

    def test_env_override_nested(self, config_dir, monkeypatch):
        monkeypatch.setenv("TWOTOWER_WANDB__PROJECT", "other-project")
        cfg = load_config(str(config_dir / "base.yml"))
        assert cfg["wandb"]["project"] == "other-project"

    def test_env_override_typed(self, config_dir, monkeypatch):
        monkeypatch.setenv("TWOTOWER_USE_WANDB", "false")
        cfg = load_config(str(config_dir / "base.yml"))
        assert cfg["use_wandb"] is False

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            load_config("does/not/exist.yml")
