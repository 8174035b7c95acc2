"""True multi-process distributed run, CI-able (VERDICT r3 item 8).

Launches tools/multiprocess_smoke.py: a REAL 2-process jax.distributed group
(coordinator + worker, 4 virtual CPU devices each, gloo collectives) driving
a {'data': 4, 'model': 2} mesh through sharded training with per-process
batch placement, an uneven row-sharded vocab, and an orbax checkpoint
save/restore. This catches the bug class single-process simulation cannot —
it found two for round 4: jit constant-folding leaving optax's `count`
host-local (parallel/train.py create_sharded_train_state), and scalar
shardings dropped through checkpoint restore (train/checkpoint.py).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_two_process_distributed_smoke(tmp_path):
    out_json = tmp_path / "multiprocess.json"
    # one retry: under full-suite load the workers' XLA compiles slow down
    # enough to trip distributed-init timing on rare runs; a genuine bug
    # fails both attempts and the second attempt's output is preserved
    for attempt in (1, 2):
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "multiprocess_smoke.py"),
             "--out_json", str(out_json)],
            capture_output=True, text=True, timeout=560)
        if proc.returncode == 0:
            break
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")

    record = json.loads(out_json.read_text())
    assert record["ok"] is True
    assert len(record["reports"]) == 2
    r0, r1 = sorted(record["reports"], key=lambda r: r["process_index"])
    assert (r0["process_index"], r1["process_index"]) == (0, 1)
    for r in (r0, r1):
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["loss_decreased"]
        assert r["checkpoint_roundtrip"]
        assert r["sharded_index_exact"]
        assert r["index_shards"] == 8
        # vocab 131 row-sharded over model=2 -> padded 66-row local shards
        assert all(rows == [66, 16] for rows in r["local_table_rows"])
    # both processes hold replicas of the same global computation
    assert r0["losses"] == r1["losses"]
    assert r0["post_restore_loss"] == r1["post_restore_loss"]
