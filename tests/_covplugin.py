"""Line-coverage collector on sys.monitoring (PEP 669) — activated from
conftest.py when KMERSET_TPU_COV is set.

The environment has no coverage.py; this stdlib-only collector records
which kmerset_tpu/ lines execute during a test run (near-zero overhead:
every non-package code location permanently DISABLEs its own event on
first fire) and dumps {filename: [lines]} JSON to $KMERSET_TPU_COV at
process exit.  benchmarks/cov_report.py turns the dump into a
per-function gap report.
"""

from __future__ import annotations

import atexit
import json
import os
import sys
from collections import defaultdict

_PKG_MARKER = os.sep + "kmerset_tpu" + os.sep


def install(out_path: str) -> None:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    if mon.get_tool(tool) is not None:  # someone else is profiling
        return
    mon.use_tool_id(tool, "kmersetcov")
    hits: dict[str, set[int]] = defaultdict(set)

    def on_line(code, line):
        fn = code.co_filename
        if _PKG_MARKER in fn:
            hits[fn].add(line)
            return None
        return mon.DISABLE

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)

    def dump():
        try:
            merged: dict[str, list[int]] = {}
            if os.path.exists(out_path):  # merge across processes
                with open(out_path) as f:
                    merged = json.load(f)
            for fn, lines in hits.items():
                merged[fn] = sorted(set(merged.get(fn, [])) | lines)
            with open(out_path, "w") as f:
                json.dump(merged, f)
        except Exception:  # noqa: BLE001 - never fail the run on dump
            pass

    atexit.register(dump)
