"""Event/time-series operators over the ``events`` table: tumbling and
sliding window aggregation, sessionization, JSON property extraction.

The reference is strictly batch with no notion of time (SURVEY.md §2.2
"streaming: NONE").  These are the batch formulations; the same
pipelines run under Structured Streaming in
:mod:`simplex_mapreduce_spark.streaming.events_stream`.

All window starts are emitted as formatted strings of NTZ wall-clock
values — session-timezone-proof on both engines (sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

SESSION_GAP_SECONDS = 1800


@register(
    "events_windows",
    deprioritized=True,  # late-round-7 rotation: hash-green r1-r6; slot
    # yielded to the newborn mixture_temperature
    oracle=f"""
    WITH sliding_base AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS b5, value
        FROM events
    ), sliding_expanded AS (
        SELECT b5 AS win_start, value FROM sliding_base
        UNION ALL
        SELECT b5 - INTERVAL 5 MINUTE AS win_start, value FROM sliding_base
    )
    SELECT 'tumbling' AS kind,
           strftime(time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)),
                    '{_FMT_DUCK}')      AS win_start,
           event_type,
           count(*)                      AS n,
           round(sum(value), 2)          AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding', strftime(win_start, '{_FMT_DUCK}'),
           CAST(NULL AS VARCHAR), count(*), round(sum(value), 2)
    FROM sliding_expanded
    GROUP BY 2
    """,
)
def events_windows(spark, sf_dir):
    """Time-window aggregation family: 5-minute tumbling windows per
    event type, plus 10-minute windows sliding every 5 minutes (each
    event lands in 2 windows; the oracle expands each event into its two
    window starts).  ``F.window`` on an NTZ column buckets wall-clock
    time exactly like DuckDB's time_bucket.
    [round-1 queries: events_tumbling_window + events_sliding_window]"""
    e = load_table(spark, sf_dir, "events")
    tumbling = (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.date_format("w.start", _FMT_SPARK).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    sliding = (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.lit("sliding").alias("kind"),
            F.date_format("w.start", _FMT_SPARK).alias("win_start"),
            F.lit(None).cast("string").alias("event_type"),
            "n",
            "total_value",
        )
    )
    return tumbling.unionByName(sliding)


@register(
    "sessionization",
    deprioritized=True,  # late-round-7 rotation: hash-green r1-r6 (and a
    # headline bench query regardless of window slot); slot yielded to
    # the newborn duplicate_text_spans_keep_first
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR lag(CAST(ts AS TIMESTAMP)) OVER w
                            + INTERVAL {SESSION_GAP_SECONDS} SECOND
                            < CAST(ts AS TIMESTAMP)
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), sessions AS (
        SELECT user_id, event_id, value,
               CAST(sum(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM gaps
    )
    SELECT user_id, session_id,
           count(*)             AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionization(spark, sf_dir):
    """30-minute-gap sessionization via lag + cumulative-sum of session
    starts: one shuffle on user_id, linear per user.  This is the batch
    equivalent of a session window (streaming variant uses
    ``F.session_window``)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact interval comparison (prev + gap < ts), NOT a seconds-diff:
    # DuckDB's date_diff counts boundary crossings while Spark's
    # timestampdiff truncates — a 1800.9s gap would disagree.
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (prev + F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECOND") < F.col("ts")),
        F.lit(1),
    ).otherwise(0)
    gaps = e.select(
        "user_id", "event_id", "value", "ts", is_new.alias("is_new_session")
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = gaps.withColumn("session_id", F.sum("is_new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "json_props_agg",
    deprioritized=True,  # rotated out late round 5 (hash-green r2-r4;
    # slot yielded to event_rate_anomalies)
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
           round(avg(len(json_keys(props))), 4)                             AS avg_nkeys,
           max(array_to_string(list_sort(json_keys(props)), ','))           AS key_sig,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k_var,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k_var,
           count(json_extract_string(props, '$.does_not_exist'))            AS n_phantom
    FROM events
    GROUP BY event_type
    """,
)
def json_props_agg(spark, sf_dir):
    """Schema-on-read over the JSON ``props`` column (the reference uses
    JSON only as its shuffle wire format, mapreduce.go:199 — never as a
    queryable type): path extraction plus the map-typed surface
    (from_json to map<string,string>, size, map_keys) with a sorted key
    signature so both engines agree regardless of key order.

    The ``*_var`` columns compute the SAME paths through Spark 4's
    VARIANT type (``parse_json`` once into a compact binary encoding,
    lazy typed extraction via ``try_variant_get``) and must hash-equal
    the JSON-string columns — the driver-verified proof of the VARIANT
    ingestion path (round 4; ``n_phantom`` counts a path absent from
    every row and must be 0, the JSON-null-vs-missing corner).  The
    standalone ``variant_props`` query remains the user-facing VARIANT
    surface (rows-only; verified through these columns)."""
    e = load_table(spark, sf_dir, "events", convert_ts=False)
    k = F.get_json_object("props", "$.k").cast("long")
    m = F.from_json("props", "map<string,string>")
    v = F.parse_json("props")
    kv = F.try_variant_get(v, "$.k", "long")
    phantom = F.try_variant_get(v, "$.does_not_exist", "string")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(F.size(m)), 4).alias("avg_nkeys"),
        F.max(F.array_join(F.array_sort(F.map_keys(m)), ",")).alias("key_sig"),
        F.round(F.avg(kv), 4).alias("avg_k_var"),
        F.max(kv).alias("max_k_var"),
        F.count(phantom).alias("n_phantom"),
    )


@register(
    "events_gapfill",
    deprioritized=True,  # round-7 rotation: hash-green r5-r6; slot
    # yielded to a never-driver-hashed query (VERDICT r6 item 2)
    oracle=f"""
    WITH counts AS (
        SELECT event_type,
               time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS w,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, min(w) AS lo, max(w) AS hi
             FROM counts GROUP BY 1),
    spine AS (SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS w
              FROM span)
    SELECT s.event_type,
           strftime(s.w, '{_FMT_DUCK}') AS win_start,
           coalesce(c.n, 0) AS n,
           c.n IS NULL AS is_gap
    FROM spine s
    LEFT JOIN counts c ON s.event_type = c.event_type AND s.w = c.w
    """,
)  # promoted to the driver's oracled window in round 4
def events_gapfill(spark, sf_dir):
    """Dense time series from sparse events: per event type, a 5-minute
    date spine from the type's first to last active window
    (``sequence`` + ``explode`` — rows bounded by the TIME RANGE, not
    the event count), left-joined against the tumbling counts with
    missing windows filled as n=0 / is_gap=true.  Gap-filling is the
    standard pre-step for time-series models and rate alerting ("no
    events in a window" must be a ROW, not an absence).  The spine build
    is a two-level aggregate (per-type min/max = tiny), the fill is one
    shuffle join on (type, window)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        "event_type", F.window("ts", "5 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    counts = counts.select("event_type", F.col("w.start").alias("w"), "n")
    span = counts.groupBy("event_type").agg(
        F.min("w").alias("lo"), F.max("w").alias("hi")
    )
    spine = span.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 5 minutes"))
        ).alias("w"),
    )
    return (
        spine.join(counts, ["event_type", "w"], "left")
        .select(
            "event_type",
            F.date_format("w", _FMT_SPARK).alias("win_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
           AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(0 AS BIGINT) AS n_phantom
FROM events
GROUP BY event_type
"""


@register(
    "variant_props",
    oracle=VARIANT_PROPS_SQL,
    deprioritized=True,  # round-8 rotation: hash-green r5-r7; slot
    # yielded to the never-driver-hashed gopher_quality_rules
)
def variant_props(spark, sf_dir):
    """Semi-structured ``props`` through Spark 4's VARIANT type:
    ``parse_json`` once into a variant column, then typed path
    extraction (``try_variant_get``) — the open-schema ingestion shape
    for logs whose fields drift.  Unlike ``from_json`` (which needs a
    schema up front and re-parses per path with ``get_json_object``),
    VARIANT parses once into a compact binary encoding, extraction is
    lazy and typed, and unknown future fields survive untouched.
    ``is_variant_null`` distinguishes JSON null from missing — the
    corner stringly-typed pipelines get wrong."""
    e = load_table(spark, sf_dir, "events", convert_ts=False)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.does_not_exist", "string")
    return (
        e.select("event_type", k.alias("k"), missing.alias("missing"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("missing").alias("n_phantom"),  # must stay 0
        )
        .orderBy("event_type")
    )


# DuckDB oracle for funnel_steps (promoted to the driver's hash window
# in round 5 — its slot came from the rotated-out string_functions);
# also reused by the local pin in tests/test_oracle_queries.py.
FUNNEL_SQL = """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               AS t_view,
           min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
               AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
               AS t_purchase
    FROM events GROUP BY user_id
), flags AS (
    SELECT user_id,
           t_view IS NOT NULL AS s1,
           t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
               AS s2,
           t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
               AND t_purchase IS NOT NULL AND t_purchase >= t_click AS s3
    FROM firsts
)
SELECT 'view' AS step, count(*) FILTER (s1) AS n_users FROM flags
UNION ALL
SELECT 'view>click', count(*) FILTER (s2) FROM flags
UNION ALL
SELECT 'view>click>purchase', count(*) FILTER (s3) FROM flags
"""


@register(
    "funnel_steps",
    oracle=FUNNEL_SQL,
    deprioritized=True,  # round-7 rotation: hash-green r5-r6; slot
    # yielded to a never-driver-hashed query (VERDICT r6 item 2)
)  # driver-oracled since round 5; monotone-conversion invariant pinned in
# tests/test_oracle_queries.py
def funnel_steps(spark, sf_dir):
    """Ordered conversion funnel view -> click -> purchase: a user
    converts step k only if their FIRST click is at/after their first
    view and their first purchase at/after that click (the standard
    strictly-ordered funnel definition).

    Plan shape at 100 TB: ONE conditional-min aggregate per user
    (map-side combinable — never a per-step join or an event-sequence
    window), then a 3-row tally of boolean flags over the tiny per-user
    frame.  Funnels over billions of events reduce to one shuffle of
    3 timestamps per user."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    s3 = (
        s2
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    )
    flags = firsts.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    return (
        flags.agg(
            F.count_if("s1").alias("n1"),
            F.count_if("s2").alias("n2"),
            F.count_if("s3").alias("n3"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.lit("view").alias("step"), F.col("n1").alias("n_users")),
                    F.struct(F.lit("view>click").alias("step"), F.col("n2").alias("n_users")),
                    F.struct(
                        F.lit("view>click>purchase").alias("step"),
                        F.col("n3").alias("n_users"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )


# DuckDB oracle for weekly_retention (promoted to the driver's hash
# window in round 5); triangle invariants pinned in
# tests/test_oracle_queries.py.
RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id,
           min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           date_diff('week', f.cohort_week,
                     date_trunc('week', CAST(e.ts AS TIMESTAMP))) AS week_offset
    FROM events e JOIN firsts f USING (user_id)
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM activity
GROUP BY 1, 2
"""


@register(
    "weekly_retention",
    oracle=RETENTION_SQL,
    deprioritized=True,  # round-7 rotation: hash-green r5-r6; slot
    # yielded to a never-driver-hashed query (VERDICT r6 item 2)
)  # driver-oracled since round 5
def weekly_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week,
    counted in every subsequent week they return — the
    (cohort_week, week_offset, n_users) triangle every growth dashboard
    plots.  Plan shape at 100 TB: one min-aggregate per user (map-side
    combinable), a shuffle join of events against that per-user frame
    on user_id, then a distinct + count over (cohort, offset, user) —
    output is #weeks^2 rows regardless of event volume.  week_offset
    uses truncated-week difference on both engines (weeks start Monday
    in Spark's date_trunc AND DuckDB's), so cohort boundaries agree."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = (
        e.select("user_id", wk.alias("activity_week"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.to_date("activity_week"), F.to_date("cohort_week")
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------- #
# Event-rate anomaly detection: trailing z-score per (event_type, hour).
# --------------------------------------------------------------------- #

ANOM_TRAIL = 24  # trailing window, hours
ANOM_MIN_PRIOR = 6  # need this many prior buckets before scoring
ANOM_Z = 3.0  # |z| flag threshold


@register(
    "event_rate_anomalies",
    # promoted into the driver hash window late round 5 (took
    # json_props_agg's rotated-out slot)
    deprioritized=True,  # late-round-7 rotation: hash-green r5-r6; slot
    # yielded to the newborn bpe_pair_counts
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, h, n,
               avg(n)         OVER w AS mu,
               stddev_samp(n) OVER w AS sd,
               count(*)       OVER w AS n_prior
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           strftime(h, '{_FMT_DUCK}') AS hour_start,
           CAST(n AS BIGINT)          AS n,
           round(mu, 4)               AS trailing_mean,
           CASE WHEN n_prior >= {ANOM_MIN_PRIOR} AND sd > 0
                THEN round((n - mu) / sd, 4) END AS zscore,
           coalesce(n_prior >= {ANOM_MIN_PRIOR} AND sd > 0
                    AND abs((n - mu) / sd) > {ANOM_Z}, FALSE) AS is_anomaly
    FROM scored
    """,
)
def event_rate_anomalies(spark, sf_dir):
    """Per-(event_type, hour) volume anomaly detection: each hourly
    count scored as a z-score against ITS OWN trailing {24}-hour
    mean/stddev (rows-frame window, current bucket excluded), flagged at
    |z| > {3} once {6}+ prior buckets exist — the pipeline-health monitor
    that catches an ingest outage (rate collapse) or a bot flood (rate
    spike) per event type without any fixed threshold tuning.  Scored
    over OBSERVED buckets; compose with events_gapfill first when
    silent-missing hours should score as zero-count anomalies.

    Scale shape: one tumbling-window groupBy collapses the raw stream to
    #types x #hours rows BEFORE the analytic window, so the sort-window
    runs on the tiny aggregate (per-type partitions, never the raw
    events); both the groupBy and the window partition by event_type, so
    the exchange is reused across the two steps at any volume."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("h"), "n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-ANOM_TRAIL, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    n_prior = F.count("n").over(w)
    z = (F.col("n") - mu) / sd
    ok = (n_prior >= ANOM_MIN_PRIOR) & (sd > 0)
    return hourly.select(
        "event_type",
        F.date_format("h", _FMT_SPARK).alias("hour_start"),
        "n",
        F.round(mu, 4).alias("trailing_mean"),
        F.when(ok, F.round(z, 4)).alias("zscore"),
        F.coalesce(ok & (F.abs(z) > ANOM_Z), F.lit(False)).alias("is_anomaly"),
    )


# --------------------------------------------------------------------- #
# Winsorization: percentile-clip outliers in a numeric measure.
# --------------------------------------------------------------------- #

WINSOR_LO, WINSOR_HI = 0.01, 0.99


@register(
    "value_winsorization",
    deprioritized=True,  # round-8 rotation: hash-green r5-r7; slot
    # yielded to the never-driver-hashed pca_top_component
    oracle=f"""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, {WINSOR_LO}) AS p01,
               quantile_cont(value, {WINSOR_HI}) AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(p01), 4) AS p01,
           round(any_value(p99), 4) AS p99,
           CAST(count(*) FILTER (round(value, 6) < round(p01, 6)) AS BIGINT)
               AS n_clipped_low,
           CAST(count(*) FILTER (round(value, 6) > round(p99, 6)) AS BIGINT)
               AS n_clipped_high,
           round(avg(value), 4) AS mean_raw,
           round(avg(least(greatest(value, p01), p99)), 4) AS mean_winsorized
    FROM events e JOIN cuts USING (event_type)
    GROUP BY e.event_type
    """,
)
def value_winsorization(spark, sf_dir):
    """Percentile winsorization audit per event type: the exact
    interpolated p01/p99 cut points of ``value``, how many rows each
    tail clips, and the mean before/after clamping — the robust-stats
    cleaning pass (sensor glitches, bot bursts, fat-fingered amounts)
    run BEFORE any mean/stddev-based feature lands in a training set,
    with the clip counts as the audit trail.

    Two honest passes: pass 1 computes exact per-type percentiles
    (Spark's ``percentile`` = linear interpolation, definitionally
    DuckDB's quantile_cont), collapsing to #types rows; pass 2 re-scans
    with those cut points joined back as a BROADCAST (the cuts table
    never grows with data) and aggregates the clipped/clamped stats
    map-side.  Exact percentiles cost a per-type sort at scale — swap
    pass 1 to approx_percentile when 100 TB latency matters more than
    exact cut points; the audit shape is identical."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    cuts = e.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("p01"),
        F.percentile("value", WINSOR_HI).alias("p99"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.any_value("p01"), 4).alias("p01"),
            F.round(F.any_value("p99"), 4).alias("p99"),
            # 6dp-rounded boundary compare: the interpolated cut differs
            # in its last float bits across engines, and a 10x-cloned
            # value sitting exactly ON the cut would flip the raw count
            # (observed at sf1)
            F.count_if(
                F.round("value", 6) < F.round("p01", 6)
            ).alias("n_clipped_low"),
            F.count_if(
                F.round("value", 6) > F.round("p99", 6)
            ).alias("n_clipped_high"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clamped), 4).alias("mean_winsorized"),
        )
    )
