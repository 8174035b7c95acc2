"""Injected-failure tests for bench.py's transient-error defenses.

Round-3 postmortem: the driver's perf record was nulled by a single transient
``FAILED_PRECONDITION`` at the first readback, and the process hung silently
when another process held the chip.  These tests prove the retry wrapper,
transiency classifier, and partial-record emission behave as designed —
without any device at all (pure host logic).
"""

import json

import pytest

import bench


class _FakeTPUError(Exception):
    pass


def test_transient_classifier():
    assert bench._is_transient(
        _FakeTPUError("FAILED_PRECONDITION: TPU backend error"))
    assert bench._is_transient(_FakeTPUError("UNAVAILABLE: socket closed"))
    assert bench._is_transient(
        _FakeTPUError("RESOURCE_EXHAUSTED: Attempting to reserve the chip"))
    # logic/shape/OOM errors must NOT retry
    assert not bench._is_transient(ValueError("shapes (3,4) and (5,) mismatch"))
    assert not bench._is_transient(
        _FakeTPUError("RESOURCE_EXHAUSTED: out of memory allocating 1TB"))


def test_retry_recovers_from_injected_transient_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise _FakeTPUError("FAILED_PRECONDITION: TPU backend error")
        return {"pairs_per_sec": 1.0}

    slept = []
    out = bench._with_retries(flaky, "t", retries=3, sleep=slept.append)
    assert out == {"pairs_per_sec": 1.0}
    assert len(calls) == 3           # two failures, then success
    assert slept == [2.0, 4.0]       # backoff between attempts


def test_retry_fails_fast_on_non_transient():
    def buggy():
        raise ValueError("a real bug")

    with pytest.raises(ValueError, match="a real bug"):
        bench._with_retries(buggy, "t", sleep=lambda s: None)


def test_retry_gives_up_after_budget():
    def always_down():
        raise _FakeTPUError("UNAVAILABLE: backend gone")

    with pytest.raises(RuntimeError, match="still failing after 2 attempts"):
        bench._with_retries(always_down, "t", retries=2, sleep=lambda s: None)


def test_main_emits_partial_record_and_survives_extra_failure(
        monkeypatch, tmp_path, capsys):
    """The headline record must hit disk before the extras run, and an extra
    that dies (even after retries) must not lose the headline."""
    monkeypatch.setattr(bench, "_acquire_device", lambda: _FakeDevice())
    monkeypatch.setattr(bench, "_bench_char_tower", lambda: {
        "pairs_per_sec": 1000.0, "step_time_ms": 1.0,
        "step_time_iqr_ms": 0.05, "step_time_trials_ms": [0.98, 1.0, 1.02],
        "gflops_per_step": 10.0, "tflops": 10.0})

    def extra_dies():
        raise _FakeTPUError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(bench, "_bench_transformer_tower", extra_dies)
    monkeypatch.setattr(bench, "_bench_word_vocab_tower",
                        lambda: {"pairs_per_sec": 5.0})
    monkeypatch.setattr(bench, "_bench_index_qps", lambda: {"qps": 7.0})
    monkeypatch.setattr(bench, "RETRIES", 2)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # point the partial record into tmp_path
    monkeypatch.setattr(bench, "Path", _PathInto(tmp_path))

    rc = bench.main()
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 1000.0
    assert out["vs_baseline"] > 0
    assert "error" in out["extra"]["transformer_tower_train"]
    assert out["extra"]["word_vocab_32k_train"] == {"pairs_per_sec": 5.0}
    partial = json.loads((tmp_path / "BENCH_PARTIAL.json").read_text())
    assert partial["value"] == 1000.0


def test_main_emits_error_record_when_headline_dies(
        monkeypatch, tmp_path, capsys):
    monkeypatch.setattr(bench, "_acquire_device", lambda: _FakeDevice())

    def headline_dies():
        raise _FakeTPUError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(bench, "_bench_char_tower", headline_dies)
    monkeypatch.setattr(bench, "RETRIES", 2)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "Path", _PathInto(tmp_path))

    rc = bench.main()
    assert rc == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] is None
    assert "FAILED_PRECONDITION" in out["error"]


class _FakeDevice:
    device_kind = "TPU v5 lite"


class _PathInto:
    """Callable standing in for pathlib.Path that roots bench's partial-record
    path inside a pytest tmp dir."""

    def __init__(self, root):
        self._root = root

    def __call__(self, _file):
        return _Resolver(self._root)


class _Resolver:
    def __init__(self, root):
        self._root = root

    def resolve(self):
        return self

    @property
    def parent(self):
        return self._root


def test_spread_median_and_iqr():
    """r5: every metric publishes median + IQR over interleaved trials."""
    out = bench._spread([3.0, 1.0, 2.0, 5.0, 4.0])
    assert out["median"] == 3.0
    assert out["trials"] == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert out["iqr"] == pytest.approx(4.0 - 2.0)
    # small-n fallback: full range
    out3 = bench._spread([2.0, 1.0, 4.0])
    assert out3["median"] == 2.0
    assert out3["iqr"] == pytest.approx(3.0)
    # singleton degenerates sanely (retry loops can yield one survivor)
    out1 = bench._spread([1.5])
    assert out1["median"] == 1.5 and out1["iqr"] == 0.0
