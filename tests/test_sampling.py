"""Stratified sampling + mixture report: DuckDB equivalence (both
driver-oracled since round 7) and the determinism properties that
justify md5-bucket sampling over rand()/TABLESAMPLE."""

from __future__ import annotations

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.sampling import (
    DEFAULT_RATE,
    DEFAULT_RATES,
    stratified_keep,
)
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames




def test_stratified_sample_matches_duckdb(spark, duck):
    """Uses the registry oracle directly (single source of truth since
    the round-4 promotion — a drift between this test and the driver
    gate is no longer possible)."""
    spark_pdf = registry.QUERIES["stratified_sample"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(registry.ORACLES["stratified_sample"]).df()
    assert len(spark_pdf) > 0
    compare_frames(spark_pdf, duck_pdf, "stratified_sample")


def test_mixture_report_matches_duckdb(spark, duck):
    spark_pdf = registry.QUERIES["mixture_report"](spark, SF_DIR).toPandas()
    # registry oracle = single source of truth since the round-7 promotion
    duck_pdf = duck.sql(registry.ORACLES["mixture_report"]).df()
    compare_frames(spark_pdf, duck_pdf, "mixture_report")
    assert abs(spark_pdf["token_frac"].sum() - 1.0) < 1e-3


def test_stratified_rates_converge(spark):
    """On a uniform synthetic corpus the realized keep-fraction per
    stratum must track the configured rate (md5 buckets are uniform)."""
    n = 4000
    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(n)], "doc_id long, source string"
    )
    rates = {"s0": 0.5, "s1": 0.1}
    kept = (
        df.filter(stratified_keep("source", rates, 0.0))
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] / (n / 2) for r in kept}
    assert abs(got["s0"] - 0.5) < 0.05
    assert abs(got["s1"] - 0.1) < 0.03


def test_stratified_sample_insert_stable(spark):
    """A document's keep/drop fate depends only on its own id and
    stratum: adding more documents never flips earlier decisions (the
    auditability property rand()-based sampling lacks)."""
    small = spark.createDataFrame(
        [(i, "s0") for i in range(100)], "doc_id long, source string"
    )
    big = spark.createDataFrame(
        [(i, "s0") for i in range(300)], "doc_id long, source string"
    )
    keep = stratified_keep("source", {"s0": 0.3}, 0.0)
    a = {r["doc_id"] for r in small.filter(keep).collect()}
    b = {r["doc_id"] for r in big.filter(keep).collect()}
    assert a == {x for x in b if x < 100}


def test_stratified_filter_is_scan_pushed(spark):
    """The keep predicate must survive as a data filter in the physical
    plan (no shuffle introduced by sampling)."""
    out = registry.QUERIES["stratified_sample"](spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_rates_for_target_mixture_exact():
    """50/30/20 target over a 70/20/10 corpus: the most underweight
    source (c: 10% actual vs 20% target) anchors at rate 1.0; others
    downsample so realized token fractions hit the target exactly."""
    from simplex_mapreduce_spark.operators.sampling import rates_for_target_mixture

    actual = {"a": 700, "b": 200, "c": 100}
    target = {"a": 0.5, "b": 0.3, "c": 0.2}
    rates = rates_for_target_mixture(actual, target)
    assert rates["c"] == 1.0
    kept = {s: actual[s] * r for s, r in rates.items()}
    total = sum(kept.values())
    for s in actual:
        assert abs(kept[s] / total - target[s]) < 1e-12
    # downsampling-only invariant
    assert all(0.0 <= r <= 1.0 for r in rates.values())


def test_rates_for_target_mixture_edge_cases():
    from simplex_mapreduce_spark.operators.sampling import rates_for_target_mixture

    # source missing from target -> dropped entirely
    rates = rates_for_target_mixture({"a": 100, "b": 100}, {"a": 1.0})
    assert rates == {"a": 1.0, "b": 0.0}
    # empty corpus / empty target
    assert rates_for_target_mixture({}, {"a": 1.0}) == {}
    assert set(rates_for_target_mixture({"a": 10}, {}).values()) == {0.0}


def test_mixture_temperature_flattens_monotonically(spark):
    """Temperature invariants: weights are a distribution, the factor
    is strictly decreasing in observed share (head sources damped, tail
    boosted), and w = p^alpha normalized recomputes in plain Python."""
    import math

    rows = registry.QUERIES["mixture_temperature"](spark, SF_DIR).collect()
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-3
    by_p = sorted(rows, key=lambda r: r["token_frac"])
    factors = [r["sample_factor"] for r in by_p]
    assert factors == sorted(factors, reverse=True)

    total = sum(r["tokens"] for r in rows)
    denom = sum(math.sqrt(r["tokens"] / total) for r in rows)
    for r in rows:
        p = r["tokens"] / total
        assert abs(r["temp_weight"] - math.sqrt(p) / denom) < 1e-5

    # composes with the downsample-only solver: valid rates, anchor = 1
    from simplex_mapreduce_spark.operators.sampling import (
        rates_for_target_mixture,
    )

    rates = rates_for_target_mixture(
        {r["source"]: r["tokens"] for r in rows},
        {r["source"]: r["temp_weight"] for r in rows},
    )
    assert all(0.0 <= v <= 1.0 for v in rates.values())
    assert max(rates.values()) == 1.0


# ------------------------------------------------------------------ #
# DSIR importance weights (round-8, Xie et al. 2023).
# ------------------------------------------------------------------ #


def test_dsir_importance_matches_python_reference(spark):
    """Per-doc log importance weights equal an in-memory add-1-smoothed
    unigram LM ratio computed straight from the parquet."""
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from simplex_mapreduce_spark.operators.sampling import (
        DSIR_TARGET_SOURCE,
        dsir_importance,
    )

    rows = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    cnt_r: Counter = Counter()
    cnt_t: Counter = Counter()
    doc_words = {}
    for r in rows:
        words = [w for w in re.split(r"\s+", r["text"].strip()) if w]
        doc_words[r["doc_id"]] = words
        cnt_r.update(words)
        if r["source"] == DSIR_TARGET_SOURCE:
            cnt_t.update(words)
    n_r, n_t, v = sum(cnt_r.values()), sum(cnt_t.values()), len(cnt_r)
    lw = {
        w: math.log((cnt_t.get(w, 0) + 1) / (n_t + v))
        - math.log((c + 1) / (n_r + v))
        for w, c in cnt_r.items()
    }
    got = {r["doc_id"]: r for r in dsir_importance(spark, SF_DIR).collect()}
    assert set(got) == {d for d, ws in doc_words.items() if ws}
    for doc_id, words in doc_words.items():
        if not words:
            continue
        expect = sum(lw[w] for w in words)
        assert got[doc_id]["n_tokens"] == len(words)
        assert math.isclose(
            got[doc_id]["log_weight"], expect, abs_tol=5e-6
        ), doc_id


def test_dsir_target_docs_score_higher_on_average(spark):
    """Directional sanity: target-source docs must average a higher
    importance weight than the rest of the corpus (they define the
    target LM)."""
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.operators.sampling import (
        DSIR_TARGET_SOURCE,
        dsir_importance,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    w = dsir_importance(spark, SF_DIR)
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    rows = (
        w.join(d, "doc_id")
        .groupBy(F.col("source") == DSIR_TARGET_SOURCE)
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_dsir_resample_is_gumbel_topk_of_weights(spark):
    """The selected set equals a python recomputation of the
    deterministic Gumbel keys over the full weight table, and the keys
    are exactly log_weight + gumbel(md5 uniform) at 6dp."""
    import hashlib
    import math

    from simplex_mapreduce_spark.operators.sampling import (
        DSIR_RESAMPLE_K,
        dsir_importance,
        dsir_resample,
    )

    weights = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance(spark, SF_DIR).collect()
    }

    def key(doc_id):
        h = hashlib.md5(f"gumbel:{doc_id}".encode()).hexdigest()[:12]
        u = (int(h, 16) + 0.5) / float(1 << 48)
        return weights[doc_id] - math.log(-math.log(u))

    expect = sorted(
        weights, key=lambda d: (-round(key(d), 6), d)
    )[:DSIR_RESAMPLE_K]
    got = dsir_resample(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in got] == expect
    for r in got:
        # 6dp pin: weight is rounded independently of the key, and the
        # key is weight+gumbel rounded once (not rounded-weight+gumbel)
        assert abs(r["sel_key"] - key(r["doc_id"])) < 2e-6
        assert r["log_weight"] == weights[r["doc_id"]]


def test_domain_divergence_metric_properties(spark):
    """JSD invariants on the real corpus: every pair present exactly
    once (a < b), values in [0, ln 2], and the matrix matches an
    in-memory numpy recomputation to 1e-6."""
    import math
    import re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from simplex_mapreduce_spark.operators.sampling import domain_divergence

    rows = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    counts: dict = defaultdict(Counter)
    for r in rows:
        counts[r["source"]].update(
            w for w in re.split(r"\s+", r["text"].strip()) if w
        )
    vocab = sorted({w for c in counts.values() for w in c})
    v = len(vocab)
    probs = {
        s: {w: (c.get(w, 0) + 1) / (sum(c.values()) + v) for w in vocab}
        for s, c in counts.items()
    }

    def jsd(s1, s2):
        t = 0.0
        for w in vocab:
            pa, pb = probs[s1][w], probs[s2][w]
            t += pa * math.log(2 * pa / (pa + pb)) + pb * math.log(
                2 * pb / (pa + pb)
            )
        return 0.5 * t

    got = {
        (r["source_a"], r["source_b"]): r["jsd"]
        for r in domain_divergence(spark, SF_DIR).collect()
    }
    srcs = sorted(counts)
    expect_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    }
    assert set(got) == expect_pairs
    for (a, b), val in got.items():
        assert 0.0 <= val <= math.log(2) + 1e-9
        assert abs(val - jsd(a, b)) < 2e-6, (a, b)
