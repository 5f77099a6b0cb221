#!/usr/bin/env python
"""Round-13 measurement helper: dump .explain('formatted') for every
declared query into plans/r13/<query>_<tag>.txt.

Usage: python scripts_r13_capture_plans.py <tag> [query ...]
With no query names, captures all declared queries.  sf dir from
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE, not data scale, is
what we are recording; the bench itself runs sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simplex_mapreduce_spark import get_spark, registry  # noqa: E402
from simplex_mapreduce_spark.plans.explain import formatted_plan  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry.load_all()
    if not names:
        names = list(registry.ordered_queries())
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r13-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    ok, failed = 0, []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — record and continue
            failed.append((name, repr(e)[:200]))
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        ok += 1
    print(f"captured {ok} plans -> {out_dir} (tag={tag})")
    for name, err in failed:
        print(f"FAILED {name}: {err}")
    spark.stop()


if __name__ == "__main__":
    main()
