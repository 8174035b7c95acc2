#!/usr/bin/env python
"""Thin wrapper over the reports CLI (parity with the reference's
/root/reference/create_report.py:1-15)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from twotowers_tpu.reports.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
