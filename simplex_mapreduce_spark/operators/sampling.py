"""Deterministic stratified sampling and domain-mixture reporting —
the "data mixture" step of a training-data pipeline: measure how many
tokens each source contributes, then down/up-weight sources to hit a
target mixture.

The reference engine has no sampling surface (src/mapreduce.go is a
fixed map/reduce pair); pure north-star extension.

Scale design:

- The sampling decision is a PER-ROW deterministic predicate (md5 slice
  of the doc id compared to the stratum's rate) — no shuffle, no
  ``rand()``.  That makes the sample reproducible across re-runs,
  engines, partitioning layouts, and incremental corpus additions (a
  doc's keep/drop fate never changes when other docs arrive), and the
  filter is pushable all the way into the scan.
- ``sampleBy``/``TABLESAMPLE`` give none of those guarantees: they are
  rand()-seeded per-partition, so a repartition or a re-run reshuffles
  who is sampled — unacceptable for an auditable corpus.
- The mixture report is one partial-aggregated groupBy over as many
  rows as there are sources — trivially small output at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.functions.textfn import tokens_col
from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

# rate resolution: keep-fractions are expressed in 1/10000ths so the
# md5-bucket comparison is exact integer arithmetic on both engines
RATE_DENOM = 10_000

# the registered query's mixture policy: keep all of src0, half of
# src1, a quarter of src2, and 10% of every long-tail source
DEFAULT_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
DEFAULT_RATE = 0.1


def _sample_key(id_col: str) -> Column:
    """Deterministic 0..9999 bucket from md5 of the id.  Salted with
    'strat:' so it is independent of doc_profile's 'sample_bucket'
    (same idiom, different hash input) — stratified sampling must not
    correlate with the train/val/test split."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col(id_col).cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(RATE_DENOM),
    )


def stratified_keep(
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    id_col: str = "doc_id",
) -> Column:
    """Boolean keep-predicate: row survives iff its deterministic
    sample key falls under its stratum's keep-fraction.  Pure column
    expression — composes with any scan and pushes down."""
    threshold = F.lit(int(round(default_rate * RATE_DENOM)))
    for stratum, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, int(round(rate * RATE_DENOM)))
            .otherwise(threshold)
        )
    return _sample_key(id_col) < threshold


_STRAT_CASE = " ".join(
    f"WHEN '{s}' THEN {int(round(r * RATE_DENOM))}"
    for s, r in sorted(DEFAULT_RATES.items())
)

STRATIFIED_SAMPLE_SQL = f"""
WITH s AS (
    SELECT doc_id, source,
           CAST('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 6)
                AS BIGINT) % {RATE_DENOM} AS sample_key
    FROM documents)
SELECT doc_id, source, sample_key FROM s
WHERE sample_key < CASE source {_STRAT_CASE}
                   ELSE {int(round(DEFAULT_RATE * RATE_DENOM))} END
"""


@register(
    "stratified_sample",
    oracle=STRATIFIED_SAMPLE_SQL,
    deprioritized=True,  # late-round-7 rotation: hash-green r4-r6; slot
    # yielded to the newborn semantic_dedup
)  # promoted
# to the driver's oracled window in round 4; also pinned locally in
# tests/test_sampling.py with the driver gate's compare
def stratified_sample(spark, sf_dir):
    """Deterministic per-source downsampling of the documents table
    under the DEFAULT_RATES mixture policy.  The keep decision is a
    scan-pushable row predicate; no shuffle anywhere in the plan."""
    d = load_table(spark, sf_dir, "documents")
    # no orderBy: the whole point is a shuffle-free scan-side filter
    return d.filter(stratified_keep("source", DEFAULT_RATES, DEFAULT_RATE)).select(
        "doc_id", "source", _sample_key("doc_id").alias("sample_key")
    )


def _mixture_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return f"""
    WITH p AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len({duckdb_tokens('text')})) AS BIGINT) AS tokens
        FROM documents GROUP BY source)
    SELECT source, n_docs, tokens,
           round(tokens / CAST(sum(tokens) OVER () AS DOUBLE), 6) AS token_frac
    FROM p
    """


@register("mixture_report", oracle=_mixture_oracle())  # driver-oracled
# since round 7 (VERDICT r6 item 2; the SQL was tests/test_sampling.py's
# local pin since round 4, now registered as the single source of truth)
def mixture_report(spark, sf_dir):
    """Per-source corpus mixture: documents, tokens, and each source's
    fraction of the total token budget — the measurement half of domain
    reweighting.  One scan, one partial-aggregated groupBy(source), and
    a single-row total joined back via a window over the tiny
    aggregate."""
    d = load_table(spark, sf_dir, "documents")
    per_src = (
        d.select("source", F.size(tokens_col("text")).cast("long").alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
    )
    total = F.sum("tokens").over(Window.partitionBy())
    return per_src.select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / total, 6).alias("token_frac"),
    ).orderBy("source")


def rates_for_target_mixture(
    actual_tokens: dict[str, int], target_frac: dict[str, float]
) -> dict[str, float]:
    """Solve the per-source keep-rates that turn an observed corpus
    mixture into a target one by DOWNSAMPLING only (no source is
    upsampled — duplicated training text is what the dedup stages just
    removed).

    The most-underrepresented-relative-to-target source keeps rate 1.0
    and pins the output size; every other source keeps
    ``target_frac / actual_frac`` relative to that anchor.  Sources
    absent from ``target_frac`` get rate 0.0.  Feed the result to
    :func:`stratified_keep`.

    Driver-side pure arithmetic over one row per source (the
    mixture_report output) — no Spark work at any corpus size."""
    total = sum(actual_tokens.values())
    if total == 0:
        return {s: 0.0 for s in actual_tokens}
    ratios = {
        s: target_frac.get(s, 0.0) / (tok / total)
        for s, tok in actual_tokens.items()
        if tok > 0
    }
    anchor = max(ratios.values(), default=0.0)
    if anchor == 0.0:
        return {s: 0.0 for s in actual_tokens}
    return {s: min(1.0, r / anchor) for s, r in ratios.items()}


# ------------------------------------------------------------------ #
# Temperature-scaled mixture: p^alpha source reweighting.
# ------------------------------------------------------------------ #

MIXTURE_ALPHA = 0.5  # temperature exponent; 0.5 = sqrt scaling (the
# multilingual-sampling convention, e.g. mBERT/XLM-R alpha=0.3-0.7 —
# fixed at 0.5 here so both engines compute it as IEEE sqrt, which is
# correctly rounded and therefore bit-identical across engines)


def _mixture_temperature_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return f"""
    WITH s AS (
        SELECT source,
               CAST(sum(len({duckdb_tokens('text')})) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
    t AS (
        SELECT source, tokens,
               tokens / CAST(sum(tokens) OVER () AS DOUBLE) AS p
        FROM s)
    SELECT source, tokens,
           round(p, 6) AS token_frac,
           round(sqrt(p) / sum(sqrt(p)) OVER (), 6) AS temp_weight,
           round((sqrt(p) / sum(sqrt(p)) OVER ()) / p, 4) AS sample_factor
    FROM t
    """


@register("mixture_temperature", oracle=_mixture_temperature_oracle())
# driver-oracled from birth (round 7); flattening invariants pinned in
# tests/test_sampling.py
def mixture_temperature(spark, sf_dir):
    """Temperature-scaled sampling weights per source: w_i proportional
    to p_i^{MIXTURE_ALPHA} where p_i is the source's observed token
    fraction — the standard way to flatten a skewed domain mixture
    without zeroing the tail (GPT-3's dataset weights; the
    alpha-sampling rule of multilingual pretraining).  ``sample_factor``
    = w_i / p_i is the relative epoch rate each source's documents
    should be drawn at (head sources < 1: downsample; tail sources > 1:
    repeat) — feed it through rates_for_target_mixture to get
    downsample-only keep rates for stratified_keep.

    One scan, one partial-aggregated groupBy(source); the temperature
    arithmetic runs over the tiny per-source aggregate via windows over
    an unpartitioned frame whose input is |sources| rows — driver-scale
    math kept declarative so the report composes into larger plans."""
    d = load_table(spark, sf_dir, "documents")
    per_src = (
        d.select("source", F.size(tokens_col("text")).cast("long").alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"))
    )
    w = Window.partitionBy()
    p = F.col("tokens") / F.sum("tokens").over(w)
    tw = F.sqrt(p) / F.sum(F.sqrt(p)).over(w)
    return per_src.select(
        "source",
        "tokens",
        F.round(p, 6).alias("token_frac"),
        F.round(tw, 6).alias("temp_weight"),
        F.round(tw / p, 4).alias("sample_factor"),
    ).orderBy("source")


# ------------------------------------------------------------------ #
# DSIR: Data Selection with Importance Resampling (Xie et al. 2023).
# ------------------------------------------------------------------ #

DSIR_TARGET_SOURCE = "src0"  # the "high-quality target domain" proxy;
# in a real deployment this is a curated corpus (Wikipedia, books) —
# here the deterministic stand-in is one named source


def _dsir_cte() -> str:
    """Shared oracle CTE chain ending in ``dw(doc_id, n_tokens,
    lw_sum)`` — the unrounded per-doc log importance weight.  Mirrors
    the Spark plan's doc-word-count formulation (sum of c*lw over the
    per-doc distinct vocabulary, not lw over token occurrences) so
    both engines run the same summation structure."""
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return f"""
    WITH toks AS (
        SELECT doc_id, source, unnest({duckdb_tokens('text')}) AS w
        FROM documents),
    wc AS (
        SELECT doc_id, w, count(*) AS c,
               max(source = '{DSIR_TARGET_SOURCE}') AS is_target
        FROM toks GROUP BY doc_id, w),
    vocab AS (
        SELECT w,
               CAST(sum(c) AS DOUBLE) AS cnt_r,
               CAST(coalesce(sum(c) FILTER (is_target), 0) AS DOUBLE)
                   AS cnt_t
        FROM wc GROUP BY w),
    scal AS (
        SELECT CAST(sum(cnt_r) AS DOUBLE) AS n_r,
               CAST(sum(cnt_t) AS DOUBLE) AS n_t,
               CAST(count(*) AS DOUBLE)   AS v
        FROM vocab),
    lr AS (
        SELECT w, ln((cnt_t + 1) / (n_t + v)) - ln((cnt_r + 1) / (n_r + v))
                  AS lw
        FROM vocab CROSS JOIN scal),
    dw AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               sum(c * lw) AS lw_sum
        FROM wc JOIN lr USING (w)
        GROUP BY doc_id)
    """


def _dsir_oracle() -> str:
    return (
        _dsir_cte()
        + " SELECT doc_id, n_tokens, round(lw_sum, 6) AS log_weight FROM dw"
    )


@register("dsir_importance", oracle=_dsir_oracle())  # round-8 addition,
# driver-oracled from birth (slot yielded by streaming_sessionization);
# python-reference parity pinned in tests/test_sampling_extra.py
def dsir_importance(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document with the log importance weight of a target-domain unigram
    LM against the raw-corpus unigram LM —
    ``log w(doc) = sum_tokens [ln p_target(w) - ln p_raw(w)]`` with
    add-1 smoothing over the joint vocabulary.  Sampling without
    replacement proportional to these weights (e.g. via the Gumbel
    top-k trick on log_weight) is the paper's selection step; the
    deterministic, hash-verifiable artifact is the weight table
    itself.  The target domain is the DSIR_TARGET_SOURCE ('src0')
    slice — a curated corpus in a real deployment.

    Scale shape at 100 TB: ONE explode of the corpus; ONE shuffle
    building BOTH language models (a single groupBy(word) with a
    conditional count for the target slice — not two passes); the
    two corpus scalars + vocab size ride a broadcast 1-row frame;
    tokens join the per-word log-ratio on the word key (shuffle join,
    NOT broadcast — the vocabulary is unbounded, Heaps' law, same
    reasoning as doc_logprob); one groupBy(doc_id) sum.  The paper's
    hashed-feature variant (bucket words into 2^k hash bins first)
    drops in as an xxhash64-pmod on the word column — kept raw here so
    the DuckDB oracle groups on identical values (the
    duplicate_text_spans hashed-key precedent, text.py)."""
    dw = _dsir_weight_frame(spark, sf_dir)
    return dw.select(
        "doc_id", "n_tokens", F.round("lw_sum", 6).alias("log_weight")
    )


def _dsir_weight_frame(spark, sf_dir):
    """(doc_id, n_tokens, lw_sum): the unrounded DSIR weight plan
    shared by ``dsir_importance`` (reports it) and ``dsir_resample``
    (Gumbel top-k selects on it).

    Round-8 plan rework after the sf10 curve flagged the naive shape
    at a 44x/100x steady ratio (the worst in the engine): the corpus
    was tokenized THREE times (once under the vocab aggregate feeding
    ``lr``, once under the broadcast scalar aggregate, once for the
    final token-stream join).  Now ONE explode collapses immediately
    to the per-doc word-count matrix (groupBy(doc_id, w) —
    map-side-combinable, and strictly smaller than the token stream
    whenever any word repeats within a doc), localCheckpointed so
    every downstream consumer reads the materialized frame instead of
    re-deriving it; both LMs, the scalars, and the weight join all run
    off it, and the per-doc weight is the count-weighted sum
    sum(c*lw) — mathematically the token-stream sum, with the join
    carrying |doc x distinct-word| rows instead of |tokens| (25.9 s ->
    11.4 s steady at sf10).  Second rework, same round: IDENTICAL-TEXT
    REP-COLLAPSE — mirrors contribute identical word counts AND
    identical weights, so the tokenize/count/join pipeline runs over
    one representative per distinct (is_target, text) group (the
    collapse key carries target-membership: same text in a different
    split would alter cnt_t), LM counts are weighted by the group's
    copy count (integer-exact equal to the naive corpus counts), and
    the finished per-rep weights fan out across the capped member
    arrays — the duplicate_text_spans/winnowing playbook applied to a
    linear (not pairwise) operator because the corpus pass itself is
    the cost.  Measured at sf10 (100-clone mirrors): 11.4 s -> 0.90 s
    steady, ratio 44.5 (naive) -> 2.35; flat 0.38 s at sf0.1 where
    mirrors are rare (the digest shuffle costs nothing visible)."""
    from simplex_mapreduce_spark.operators.dedup import (
        _capped_groups,
        _group_representatives,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"),
        "text",
    )
    dg = F.md5(
        F.concat_ws(
            "\x00", F.col("is_target").cast("string"), F.col("text")
        )
    )
    subs = _capped_groups(d.select("doc_id", dg.alias("dg")), "dg")
    sizes = subs.groupBy("rep").agg(
        F.sum(F.size("members")).cast("long").alias("n_copies")
    )
    reps = d.join(_group_representatives(subs), "doc_id", "left_semi").join(
        sizes.withColumnRenamed("rep", "doc_id"), "doc_id"
    )
    wc = (
        reps.select(
            "doc_id",
            "is_target",
            "n_copies",
            F.explode(tokens_col("text")).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("is_target").alias("is_target"),
            F.max("n_copies").alias("n_copies"),
        )
        .localCheckpoint(eager=False)  # one tokenize pass, three readers
    )
    vocab = wc.groupBy("w").agg(
        F.sum(F.col("c") * F.col("n_copies")).cast("double").alias("cnt_r"),
        F.coalesce(
            F.sum(
                F.when(F.col("is_target"), F.col("c") * F.col("n_copies"))
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("cnt_t"),
    ).localCheckpoint(eager=False)  # Heaps-sized; read by scal AND lr
    scal = vocab.agg(
        F.sum("cnt_r").alias("n_r"),
        F.sum("cnt_t").alias("n_t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(scal)).select(
        "w",
        (
            F.log((F.col("cnt_t") + 1) / (F.col("n_t") + F.col("v")))
            - F.log((F.col("cnt_r") + 1) / (F.col("n_r") + F.col("v")))
        ).alias("lw"),
    )
    rep_dw = (
        wc.join(lr, "w")
        .groupBy(F.col("doc_id").alias("rep_id"))
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lw")).alias("lw_sum"),
        )
    )
    members = subs.select(
        F.col("rep").alias("rep_id"), F.explode("members").alias("doc_id")
    )
    return rep_dw.join(members, "rep_id").select(
        "doc_id", "n_tokens", "lw_sum"
    )


# ------------------------------------------------------------------ #
# DSIR selection: Gumbel top-k sampling without replacement.
# ------------------------------------------------------------------ #

DSIR_RESAMPLE_K = 100  # documents selected
_GUMBEL_DENOM = float(1 << 48)  # 12 md5 hex digits of uniform entropy


def _dsir_resample_oracle() -> str:
    return (
        _dsir_cte()
        + f""",
    keyed AS (
        SELECT doc_id, n_tokens, round(lw_sum, 6) AS log_weight,
               round(lw_sum - ln(-ln(
                   (CAST('0x' ||
                         substr(md5('gumbel:' || CAST(doc_id AS VARCHAR)),
                                1, 12) AS BIGINT) + 0.5)
                   / {_GUMBEL_DENOM!r})), 6) AS sel_key
        FROM dw)
    SELECT doc_id, n_tokens, log_weight, sel_key
    FROM keyed ORDER BY sel_key DESC, doc_id LIMIT {DSIR_RESAMPLE_K}
    """
    )


@register("dsir_resample", oracle=_dsir_resample_oracle())  # round-8
# addition, driver-oracled from birth (slot yielded by
# q22_idle_balances); distribution properties pinned in
# tests/test_sampling.py
def dsir_resample(spark, sf_dir):
    """The SELECTION step of DSIR (Xie et al. 2023 §2.3): sample K
    documents without replacement with probability proportional to
    their importance weights, via the Gumbel top-k trick — add an
    independent Gumbel(0,1) draw to each log-weight and keep the K
    largest keys (Vieira 2014; exactly equivalent to sequential
    weighted sampling without replacement).

    The Gumbel draw is DETERMINISTIC: u = (md5-derived 48-bit integer
    + 0.5) / 2^48 per doc_id (the stratified-sampling md5 idiom, its
    own 'gumbel:' salt), g = -ln(-ln(u)).  That keeps the selection
    reproducible across re-runs, engines, and partitionings — the same
    auditability argument as stratified_keep — and lets the DuckDB
    oracle draw the identical noise.  The published key is rounded to
    6dp BEFORE the (sel_key DESC, doc_id) order so the cross-engine
    cut is decided on identical values, never on sub-ulp float drift.

    Scale shape: the weight plan is dsir_importance's (one corpus
    explode, one vocab shuffle, one doc_id agg); the selection adds
    only per-row arithmetic and a top-K — TakeOrderedAndProject: a
    K-row heap per partition merged on the driver, never a global
    sort.  K rows of driver state, like every other selection rung."""
    dw = _dsir_weight_frame(spark, sf_dir)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("gumbel:"), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (bucket + F.lit(0.5)) / F.lit(_GUMBEL_DENOM)
    keyed = dw.select(
        "doc_id",
        "n_tokens",
        F.round("lw_sum", 6).alias("log_weight"),
        F.round(F.col("lw_sum") - F.log(-F.log(u)), 6).alias("sel_key"),
    )
    return keyed.orderBy(F.col("sel_key").desc(), "doc_id").limit(
        DSIR_RESAMPLE_K
    )


# ------------------------------------------------------------------ #
# Domain divergence: pairwise JSD between per-source unigram LMs.
# ------------------------------------------------------------------ #


def _domain_divergence_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return f"""
    WITH toks AS (
        SELECT source, unnest({duckdb_tokens('text')}) AS w FROM documents),
    wc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
    vocab AS (SELECT DISTINCT w FROM wc),
    nsrc AS (SELECT source, CAST(sum(c) AS DOUBLE) AS n
             FROM wc GROUP BY source),
    vn AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
    grid AS (SELECT s.source, vv.w, s.n FROM nsrc s CROSS JOIN vocab vv),
    p AS (
        SELECT g.source, g.w, (coalesce(wc.c, 0) + 1) / (g.n + vn.v) AS p
        FROM grid g
        LEFT JOIN wc ON wc.source = g.source AND wc.w = g.w
        CROSS JOIN vn),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.p AS pa, b.p AS pb
        FROM p a JOIN p b ON a.w = b.w AND a.source < b.source)
    SELECT source_a, source_b,
           round(0.5 * sum(pa * ln(2 * pa / (pa + pb))
                           + pb * ln(2 * pb / (pa + pb))), 6) AS jsd
    FROM pairs GROUP BY source_a, source_b
    """


@register("domain_divergence", oracle=_domain_divergence_oracle())
# round-8 addition, driver-oracled from birth (slot yielded by
# q13_order_count_distribution); metric properties pinned in
# tests/test_sampling.py
def domain_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between every two sources'
    add-1-smoothed unigram language models — the domain-similarity
    matrix a mixture designer reads BEFORE setting weights (sources
    near zero are redundant and compete for budget; the most divergent
    pairs are where temperature flattening loses the most signal; in
    nats, symmetric, bounded by ln 2).

    Scale shape: one corpus explode collapsing map-side to per-source
    word counts (the only corpus-sized shuffle); per-source totals are
    a |domains|-row broadcast; the smoothed probability GRID is
    |vocab| x |domains| (one dense frame so absent-in-one-source words
    still contribute their smoothed mass — a join on co-occurring
    words alone would silently underestimate the divergence); the pair
    term is |vocab| x |domains|^2 / 2 rows through ONE shuffle join on
    the word key — quadratic only in the DOMAIN count, which is
    corpus-structural (dozens) and never data-sized.  All downstream
    of the count collapse, nothing rescans the corpus."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # read by vocab, totals, and p
    )
    vocab = wc.select("w").distinct()
    nsrc = wc.groupBy("source").agg(F.sum("c").cast("double").alias("n"))
    vn = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    grid = vocab.crossJoin(F.broadcast(nsrc))
    p = (
        grid.join(wc, ["source", "w"], "left")
        .crossJoin(F.broadcast(vn))
        .select(
            "source",
            "w",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                / (F.col("n") + F.col("v"))
            ).alias("p"),
        )
    )
    a = p.select(
        F.col("source").alias("source_a"), "w", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("source_b"), "w", F.col("p").alias("pb")
    )
    pairs = a.join(b, "w").filter(F.col("source_a") < F.col("source_b"))
    two = F.lit(2.0)
    term = F.col("pa") * F.log(
        two * F.col("pa") / (F.col("pa") + F.col("pb"))
    ) + F.col("pb") * F.log(two * F.col("pb") / (F.col("pa") + F.col("pb")))
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.round(0.5 * F.sum(term), 6).alias("jsd"))
    )
