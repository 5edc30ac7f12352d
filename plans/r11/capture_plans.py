#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries into plans/r11/.

Usage: python plans/r11/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after"
  names:  registry names to capture (default: all 50)

Writes plans/r11/<name>_<suffix>.txt.  Builders run under the same
session confs as bench.py (sf dir from $SPARK_GRAFT_SF_DIR, default
sf0.1; cores from $SPARK_GRAFT_CPUS).  NOTE: a builder that trains
driver-side (IVF/Lloyd, BPE) executes its training jobs during build;
the captured plan is the final returned frame's.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from clear_map_data_pipeline_spark.registry import load_all  # noqa: E402
from clear_map_data_pipeline_spark.session import (  # noqa: E402
    ensure_package_on_workers,
    get_spark,
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r11")
    spark = get_spark("plan-capture")
    ensure_package_on_workers(spark)
    registry = load_all()
    if not names:
        names = list(registry)
    for name in names:
        df = registry[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
