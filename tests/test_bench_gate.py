"""Bench regression gate (VERDICT r2 item 4).

Runs every bench.py headline query TWICE at sf0.1 on the shared test
session and asserts the second-pass (steady-state) total stays under
2x the recorded driver baseline.  The two-pass harness follows
BASELINE.md's codegen-floor note: first execution of each distinct plan
pays ~1 s of JVM codegen that amortizes away at real scale, so gating
on the cold pass would flag compile latency, not regressions.

The gate is deliberately wide (2x): sub-second per-query noise on a
shared box is expected; what must fail here is the structural
regression class — a join that stopped broadcasting, an agg that lost
its partial phase, an operator that fell back to row-at-a-time Python —
all of which cost multiples, not percents.
"""

from __future__ import annotations

import os
import time

import pytest

from simplex_mapreduce_spark import registry

# driver-recorded total at sf0.1 (BENCH_r02.json: 13.833 s; quiet-system
# best 13.3 s) — the steady-state second pass runs well under this, so
# 2x the cold-pass record is a generous structural-regression bound.
BASELINE_TOTAL_S = 13.833
GATE_FACTOR = 2.0

BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(
    not os.path.isdir(BENCH_SF_DIR), reason=f"{BENCH_SF_DIR} not present"
)
def test_headline_steady_state_total_under_gate(spark):
    from bench import HEADLINE

    def one_pass() -> float:
        total = 0.0
        for name in HEADLINE:
            df = registry.QUERIES[name](spark, BENCH_SF_DIR)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            total += time.perf_counter() - t0
        return total

    one_pass()  # cold pass: JVM codegen + shuffle-file warmup
    steady = one_pass()
    gate = GATE_FACTOR * BASELINE_TOTAL_S
    assert steady <= gate, (
        f"steady-state headline total {steady:.1f}s exceeds gate {gate:.1f}s "
        f"(= {GATE_FACTOR}x recorded baseline {BASELINE_TOTAL_S}s at sf0.1) — "
        "structural perf regression, check the plans of the slowest queries"
    )
