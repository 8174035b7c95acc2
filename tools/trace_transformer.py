#!/usr/bin/env python
"""Capture a jax.profiler trace of the transformer train step and print the
top HLO ops by self time (xprof/tensorboard_plugin_profile parsing).

Companion to tools/profile_transformer.py's ablation probes: the trace gives
ground-truth op-level attribution of the 72 ms step.

Run: python tools/trace_transformer.py [--out /tmp/tf_trace]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def capture(trace_dir: str) -> None:
    import jax

    from tools.profile_transformer import BATCH, SEQ, VOCAB, build

    spec, params, loss_def, optimizer, step, state = build()
    rng = np.random.default_rng(0)
    ids = jax.device_put(
        rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
    ids2 = jax.device_put(
        rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32))
    weights = jax.device_put(np.ones(BATCH, np.float32))

    # warm up the compile outside the trace
    state, m = step(state, ids, ids2, None, weights)
    float(m["loss"])
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = step(state, ids, ids2, None, weights)
        float(m["loss"])


def summarize(trace_dir: str, top: int = 30):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats^", {})
    return data


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/tf_trace")
    parser.add_argument("--parse_only", action="store_true")
    args = parser.parse_args()

    if not args.parse_only:
        capture(args.out)
        print(f"trace written to {args.out}", file=sys.stderr, flush=True)

    try:
        data = summarize(args.out)
        out_path = Path(args.out) / "framework_op_stats.json"
        if isinstance(data, (bytes, str)):
            text = data.decode() if isinstance(data, bytes) else data
            out_path.write_text(text)
            print(f"parsed stats -> {out_path}", file=sys.stderr)
            # print a compact top-N by self time if the payload is JSON
            try:
                payload = json.loads(text)
                print(json.dumps(payload, indent=2)[:4000])
            except Exception:
                print(text[:4000])
        else:
            print(type(data), str(data)[:2000])
    except Exception as exc:
        print(f"parse failed: {type(exc).__name__}: {exc}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
