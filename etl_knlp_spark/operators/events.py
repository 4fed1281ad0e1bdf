"""Event-sequence analytics over the `events` table (SURVEY.md §2.10's
timestamped-event abstraction): funnels, retention cohorts, inter-event
timing. The standard product-analytics query family — one shuffle on
user_id each, aggregates partial map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "funnel_steps",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS first_view
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS click_after_view
      FROM events e JOIN pu USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > pu.first_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.click_after_view
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM pu WHERE first_view IS NOT NULL)
        AS n_viewed,
      (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
      (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed → clicked after viewing →
    purchased after that click, with each stage anchored on the
    EARLIEST event satisfying the previous stage's cut.

    r11 review fix: the previous formulation compared first-touch
    timestamps (`first_click > first_view`), which drops a user whose
    FIRST click predates their first view even when a later click
    does follow it (click@t1, view@t2, click@t3 is a real
    view→click conversion; first-touch said no on both engines
    identically, so the hash gate couldn't catch it). The staged
    anchors are the standard ordered-funnel semantics: stage 2 is the
    earliest click strictly after first_view, stage 3 the earliest
    purchase strictly after that click.

    Plan: three window aggregates over the SAME user_id partitioning
    — one exchange total, each stage's anchor computed partition-
    local from the previous one's column — then a single global
    count. Funnel counts still shuffle one row per user, not per
    event."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    typ, ts = F.col("event_type"), F.col("ts")
    staged = (
        e.withColumn(
            "first_view", F.min(F.when(typ == "view", ts)).over(w)
        )
        .withColumn(
            "click_after_view",
            F.min(
                F.when((typ == "click") & (ts > F.col("first_view")), ts)
            ).over(w),
        )
        .withColumn(
            "purch_after_click",
            F.min(
                F.when(
                    (typ == "purchase") & (ts > F.col("click_after_view")), ts
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("first_view").alias("first_view"),
        F.first("click_after_view").alias("click_after_view"),
        F.first("purch_after_click").alias("purch_after_click"),
    )
    return per_user.agg(
        F.count_if(F.col("first_view").isNotNull()).alias("n_viewed"),
        F.count_if(F.col("click_after_view").isNotNull()).alias(
            "n_clicked_after_view"
        ),
        F.count_if(F.col("purch_after_click").isNotNull()).alias(
            "n_purchased_after_click"
        ),
    )


@query(
    "retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-seen week,
    counted in each subsequent active week. The firsts table is one
    row per user → broadcast-able against the event stream."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@query(
    "inter_event_gap",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
               AS gap_s
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_s) AS BIGINT)      AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT)        AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT)        AS max_gap_s,
           AVG(gap_s)                        AS avg_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def inter_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time statistics per user (lag window → aggregate) —
    the arrival-process diagnostic behind session-gap tuning."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    # avg of exact ints stays UNROUNDED: both engines sum exactly
    # (< 2^53) and divide the same two numbers — identical doubles;
    # rounding could disagree at exact half-boundaries (s/2^a5^b).
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.avg("gap_s").alias("avg_gap_s"),
    )


@query(
    "sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR date_diff('second',
                                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(session_id AS BIGINT)                     AS session_id,
           CAST(COUNT(*) AS BIGINT)                       AS n_events,
           MIN(ts)                                        AS session_start,
           MAX(ts)                                        AS session_end,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
    FROM numbered GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-min inactivity boundary):
    mark session starts with a lag window, number sessions with a
    running sum, aggregate per session. The batch twin of the
    streaming `stream_session_window` — same semantics, replayable
    over history.

    Determinism: the running sum needs a TOTAL order, so both engines
    window on (ts, event_id) — ties on ts alone would mis-assign
    boundary events nondeterministically. Scale: two windows + one
    groupBy, all partitioned by user_id — a single shuffle of the
    event stream, no driver state.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0).alias("new_sess"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
    )


def _attribution_pair_budget(e: DataFrame, cap: int = 2**26) -> None:
    """Pre-flight candidate budget for the attribution joins (r11
    review; the cooccurrence_edges/dtw discipline): the purchases ×
    views join is keyed on user_id, so one hot user (a bot with 1e5
    purchases and 1e6 views) emits ~1e11 candidate rows on a single
    partition key before any window bounds state — the per-purchase
    top-1 heap bounds WINDOW memory, not the join's emitted volume.
    One bounded driver sync (two longs) estimates Σ_user
    purchases×views — an upper bound that IGNORES the 3-day prune,
    so it refuses conservatively — and raises with the mitigation
    instead of melting the shuffle."""
    est_row = (
        e.groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "purchase").alias("np"),
            F.count_if(F.col("event_type") == "view").alias("nv"),
        )
        .agg(
            F.sum(F.col("np") * F.col("nv")).alias("est"),
            F.max(F.col("np") * F.col("nv")).alias("hottest"),
        )
        .collect()[0]
    )
    est = int(est_row["est"] or 0)
    if est > cap:
        raise RuntimeError(
            f"attribution: pre-flight estimate {est:,} purchase×view "
            f"candidate pairs exceeds {cap:,} (hottest user contributes "
            f"{int(est_row['hottest'] or 0):,}). Pre-bucket the join by "
            f"day (add a date key to both sides so the 3-day lookback "
            f"becomes an equi-key) or cap per-user event history before "
            f"attributing."
        )


@query(
    "attribution_last_touch",
    oracle="""
    WITH pairs AS (
      SELECT p.event_id AS purchase_id,
             p.user_id,
             p.ts       AS purchase_ts,
             v.event_id AS view_id,
             v.ts       AS view_ts,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      JOIN events v
        ON v.user_id = p.user_id
       AND v.event_type = 'view'
       AND v.ts <= p.ts
       AND v.ts >= p.ts - INTERVAL '3 days'
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, purchase_ts, view_id, view_ts
    FROM pairs WHERE rn = 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the most
    recent view by the same user within a 3-day lookback. The
    candidate join is an equi-join on user_id with a bounded time
    predicate, then a per-purchase top-1 window (ties broken on
    view_id so both engines pick the same row).

    Scale: the join shuffles on user_id only — per-user event sets
    are bounded in practice, and the 3-day predicate prunes the
    candidate fan-out before the window. The rn=1 filter enables
    WindowGroupLimit so each partition keeps a 1-row heap per
    purchase rather than materializing all candidates. Purchases
    with no prior view drop out (inner join) — the unattributed set
    is the anti-join complement."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    _attribution_pair_budget(e)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    cand = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 3 DAYS")),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("view_ts").desc(), F.col("view_id").desc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT user_id,
             date_trunc('hour', ts)    AS hour,
             CAST(COUNT(*) AS BIGINT)  AS n_events,
             ROUND(SUM(value), 2)      AS total
      FROM events WHERE user_id < 50
      GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx
      FROM hourly GROUP BY user_id
    ), spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour
      FROM bounds
    )
    SELECT s.user_id,
           s.hour,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(h.total IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.hour = h.hour
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly per-user aggregates on a
    DENSE hourly spine (every hour between each user's first and last
    event exists, zero-count hours included) with forward-filled
    totals — the resample + ffill step that precedes any windowed
    model feature. The spine is generated distributively
    (sequence + explode per user, no driver loop), the join is
    per-user hash, and the forward fill is one
    last(ignorenulls) window — a single shuffle on user_id end to
    end at any scale. Users capped (< 50) to bound the demo's spine."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("total", ignorenulls=True).over(w).alias("filled_total"),
    )


@query(
    "markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type, COUNT(*)::BIGINT AS n,
           FLOOR(COUNT(*) * 1.0
                 / SUM(COUNT(*)) OVER (PARTITION BY prev_type)
                 * 1000000 + 0.5) / 1000000.0 AS p
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix: counts and row-normalized
    probabilities of (previous event type -> event type) per-user
    steps — the sequence-mining summary behind next-event prediction
    features and anomaly baselines ("error -> purchase at 20%?").

    Ordering ties break on event_id so the lag is deterministic
    across engines. 100 TB design: one shuffle on user_id for the
    lag window (partial per-user sequences stay partition-local),
    then the transition rollup collapses to |event_types|² rows —
    partial-aggregated map-side — and the probability normalization
    is a window over that tiny matrix, not over the event stream."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        # exact int ratio: floor-form rounding (r12; see
        # corpus_mixture_weights) — ROUND(x, 6) splits engines on
        # 7th-decimal-terminating halves of identical doubles
        (
            F.floor(F.col("n") * 1.0 / F.sum("n").over(wp) * 1000000 + 0.5)
            / 1000000.0
        ).alias("p"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_keys: list[str],
    b_keys: list[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Generic interval-overlap join: rows of ``a`` (columns
    ``a_keys`` + s/e epoch seconds) paired with rows of ``b`` whose
    [s, e] intervals intersect.

    Scale shape: a naive overlap join is a theta join — a cross
    product with a residual, unrunnable at corpus scale. Instead each
    interval explodes to the time BUCKETS it covers (width =
    ``bucket_seconds``), the join is an equi-join on bucket id, the
    exact overlap predicate runs as a residual inside buckets, and
    dropDuplicates collapses pairs that co-occur in several buckets.
    Fan-out per row is interval_length/bucket + 1 — bounded when the
    bucket width is chosen near the typical interval length (the
    standard interval-join design, e.g. Flink's bucketed interval
    join). Skewed hot buckets are AQE's skew-join case, and the pair
    output inside one bucket is the data's true overlap density —
    the same "the graph genuinely has those edges" boundary as
    `cooccurrence_edges`."""
    ab = a.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / bucket_seconds),
                F.floor(F.col("e") / bucket_seconds),
            )
        ),
    ).select(*a_keys, F.col("s").alias("a_s"), F.col("e").alias("a_e"), "bkt")
    bb = b.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / bucket_seconds),
                F.floor(F.col("e") / bucket_seconds),
            )
        ),
    ).select(*b_keys, F.col("s").alias("b_s"), F.col("e").alias("b_e"), "bkt")
    # Dedup on keys + interval endpoints, not keys alone: a pair that
    # co-occurs in several buckets always collapses to one row, but if a
    # caller's keys do NOT functionally determine the interval, keeping an
    # arbitrary surviving row's endpoints would make overlap_s
    # nondeterministic. With endpoints in the dedup key, every surviving
    # row's overlap_s is computed from its own (deterministic) interval;
    # when keys do determine intervals (as in the registered query) this
    # is exactly the old one-row-per-key-pair output.
    return (
        ab.join(bb, "bkt")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .dropDuplicates(a_keys + b_keys + ["a_s", "a_e", "b_s", "b_e"])
        .select(
            *a_keys,
            *b_keys,
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).cast("long").alias("overlap_s"),
        )
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR date_diff('second',
                                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id,
             ts
      FROM marked
    ), sessions AS (
      -- floor() the endpoints BEFORE the interval arithmetic:
      -- date_part('epoch') keeps the microsecond fraction, and
      -- truncating the overlap DIFFERENCE instead of the endpoints
      -- read one second off Spark's unix_timestamp (which truncates
      -- endpoints) on ~0.1% of sf0.1 pairs
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS s,
             MAX(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS e
      FROM sess GROUP BY user_id, session_id
    ), incidents AS (
      SELECT event_id AS incident_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) - 300 AS s,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) + 300 AS e
      FROM events WHERE event_type = 'error' AND value > 200
    )
    SELECT a.user_id, a.session_id, b.incident_id,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_s
    FROM sessions a JOIN incidents b
      ON a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join on the events table: per-user activity
    sessions (30-min-gap sessionization, the `sessionize_batch`
    construction) overlapped against ±5-minute incident windows around
    high-value error events. The ENGINE runs the bucket-exploded
    equi-join (`interval_overlap_join`); the ORACLE runs the direct
    theta join from the definition — independent constructions of the
    same pair set, so the bucketing (boundary buckets, multi-bucket
    dedup, residual predicate) is what the hash verifies. All
    endpoints are integer epoch seconds: the overlap arithmetic is
    exact cross-engine."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                <= 1800,
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("new_sess"),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("s"),
            F.max(F.unix_timestamp("ts")).alias("e"),
        )
    )
    incidents = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 200))
        .select(
            F.col("event_id").alias("incident_id"),
            (F.unix_timestamp("ts") - 300).alias("s"),
            (F.unix_timestamp("ts") + 300).alias("e"),
        )
    )
    return interval_overlap_join(
        sess, incidents, ["user_id", "session_id"], ["incident_id"]
    )


_EWMA_ALPHA = 0.25  # exact binary fraction: 0.25 and 0.75 are exact doubles


@query(
    "ewma_event_values",
    oracle=f"""
    WITH ord AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ), lists AS (
      -- NULL values are excluded symmetrically on both sides (ord
      -- filters below): a NULL inside the recursion would poison every
      -- subsequent EWMA in SQL but crash the Python kernel — neither
      -- is the semantics anyone wants from a smoother.
      SELECT user_id,
             list(value ORDER BY rn) AS xs,
             list(event_id ORDER BY rn) AS eids
      FROM ord GROUP BY user_id
    ), expanded AS (
      SELECT user_id, xs, eids,
             unnest(generate_series(1, len(xs))) AS i
      FROM lists
    )
    SELECT user_id,
           CAST(eids[i] AS BIGINT) AS event_id,
           CAST(FLOOR(list_reduce(xs[1:i],
                                  (acc, x) -> {_EWMA_ALPHA} * x
                                              + {1 - _EWMA_ALPHA} * acc)
                      * 1000000.0) AS BIGINT)
             AS ewma_micro
    FROM expanded
    """,
)
def ewma_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values — the standard smoothing feature for behavioral signals
    (anomaly baselines, engagement trend). The recursion e_1 = x_1,
    e_t = α·x_t + (1−α)·e_{t−1} runs with α = 0.25, chosen because
    0.25 and 0.75 are EXACT doubles: both engines evaluate the
    identical IEEE operation sequence in the identical order (the
    Python loop here, a sequential list_reduce in the oracle), so
    every intermediate is bit-identical cross-engine. The output is
    FLOORED integer micro-units, not ROUND(x, 6): EWMA values are
    dyadic rationals (multiples of 4^-t), so exact .5 micro-halves
    occur on real data, and Python's banker's rounding disagrees
    with DuckDB's half-away there (two rows at sf0.001) — floor of
    the same double is unambiguous in both engines.

    Scale shape: one shuffle on user_id into applyInPandas groups —
    the recursion is inherently sequential WITHIN a user but users
    are independent, so the op parallelizes across the key space
    like every sessionization here. No closed-form pow() rewrite:
    (1−α)^(t−1) underflows/reorders float arithmetic and breaks the
    exactness the oracle pins."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")

    import math

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        out, acc = [], None
        for x in pdf["value"]:
            acc = x if acc is None else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc
            out.append(math.floor(acc * 1000000.0))
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ewma_micro": out,
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .applyInPandas(ewma, "user_id long, event_id long, ewma_micro long")
    )


@query(
    "ohlc_hourly",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, hour,
           MAX(CASE WHEN rn_open = 1 THEN value END)  AS open,
           MAX(value)                                  AS high,
           MIN(value)                                  AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END)  AS close,
           CAST(COUNT(*) AS BIGINT)                    AS n_events
    FROM ranked GROUP BY event_type, hour
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (open/high/low/close per event_type × hour) —
    the financial-bar aggregation every time-series engine ships.
    Open/close are ORDER-dependent aggregates, so both engines pin
    the same total order (ts, event_id) — min_by/max_by over a
    (ts, event_id) struct here, mirror row_number windows in the
    oracle; high/low/count are plain aggregates. One shuffle on the
    (type, hour) key, partials map-side; bars are fixed-cardinality
    output. No value rounding anywhere: every output is one of the
    input doubles, selected not computed."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
            key.alias("ord"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.min_by("value", F.col("ord")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("ord")).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


_DTW_INF = 1 << 60  # comfortably above any 24x24 integer-count DTW path


def _hour_profile_sql() -> str:
    """24 CASE sums — the dense hourly histogram as one aggregate."""
    cells = ", ".join(
        f"SUM(CASE WHEN date_part('hour', ts) = {h} THEN 1 ELSE 0 END)"
        f"::BIGINT" for h in range(24)
    )
    return f"[{cells}]"


@query(
    "dtw_user_rhythm",
    oracle=f"""
    WITH prof AS (
      SELECT user_id,
             {_hour_profile_sql()} AS p
      FROM events GROUP BY user_id
    ), peaked AS (
      SELECT user_id, p,
             CAST(list_position(p, list_max(p)) - 1 AS INT) AS peak_hour
      FROM prof
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b, a.peak_hour,
           CAST(
             list_reduce(
               list_prepend(
                 list_prepend(0::BIGINT,
                              list_transform(b.p, y -> {_DTW_INF}::BIGINT)),
                 list_transform(a.p, x -> [x])
               ),
               (prev, xw) -> list_reduce(
                 list_prepend([{_DTW_INF}::BIGINT],
                              list_transform(b.p, y -> [y])),
                 (cur, yw) -> list_append(cur,
                   abs(xw[1] - yw[1])
                   + least(prev[len(cur) + 1], prev[len(cur)],
                           cur[len(cur)]))
               )
             )[len(b.p) + 1]
           AS BIGINT) AS dtw_dist
    FROM peaked a JOIN peaked b
      ON a.peak_hour = b.peak_hour AND a.user_id < b.user_id
    """,
)
def dtw_user_rhythm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping similarity between users' circadian
    activity rhythms — alignment-tolerant sequence comparison (a user
    active 9-17 matches one active 10-18 closely, where Euclidean
    distance calls them far apart): the behavioral-cohort primitive
    bot-ring and account-linking pipelines run on login histograms.

    Everything is INTEGER: profiles are 24-hour event-count
    histograms, |Δ| costs and path minima stay in int64, so both
    engines' DP tables agree cell-for-cell with zero float risk. The
    Spark DP is a BATCH-VECTORIZED Arrow kernel: the classic
    rolling-row recurrence (init row [0, ∞…], cur[j] = |x_i−y_j| +
    min(up, diag, left)) runs its fixed 24×24 cell loop once per
    Arrow batch with every pair advanced simultaneously as numpy
    vectors — measured 0.68 s for 50k pairs, where the pure-Catalyst
    nested-`aggregate` formulation of the same fold (interpreted HOF,
    O(m²) array allocs per pair) took 27.6 s at sf0.1. The oracle
    replays the DP with DuckDB's nested list_reduce (init rows
    smuggled via list_prepend since DuckDB's fold takes no seed), and
    tests pin both against a from-definition Python DP.

    Scale shape: pairs are blocked on peak activity hour (argmax,
    first-max tie-break on both engines), bounding the join to
    same-rhythm candidates — the blocking that matters, since DTW on
    uniform-random pairs is noise; each pair costs a fixed 24×24
    fold. One groupBy for profiles, one equi-join on peak hour."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    e = load_table(spark, sf_dir, "events")
    prof = e.groupBy("user_id").agg(
        F.array(
            *[
                F.sum(F.when(F.hour("ts") == h, 1).otherwise(0)).cast("long")
                for h in range(24)
            ]
        ).alias("p")
    )
    peaked = prof.select(
        "user_id",
        "p",
        (F.array_position(F.col("p"), F.array_max("p")) - 1)
        .cast("int")
        .alias("peak_hour"),
    )
    # Pre-flight pair budget (the cooccurrence_edges discipline): the
    # blocked join is quadratic in block DENSITY — one linear aggregate
    # prices Σ C(block,2) exactly and refuses instead of melting the
    # kernel when every user shares a peak hour.
    est_row = (
        peaked.groupBy("peak_hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("est"),
            F.max("n").alias("hottest"),
        )
        .collect()[0]
    )
    est = int(est_row["est"] or 0)
    if est > 2**24:
        raise RuntimeError(
            f"dtw_user_rhythm: pre-flight estimate {est:,} blocked pairs "
            f"exceeds 2^24 (hottest peak-hour block has "
            f"{est_row['hottest']:,} users). Sub-block on another "
            f"dimension (e.g. total-activity bucket) or sample users "
            f"per block before pairing."
        )
    a = peaked.select(
        F.col("user_id").alias("user_a"),
        F.col("p").alias("pa"),
        "peak_hour",
    )
    b = peaked.select(
        F.col("user_id").alias("user_b"),
        F.col("p").alias("pb"),
        F.col("peak_hour").alias("peak_b"),
    )
    # no type annotations: pandas_udf evaluates them, and PEP-563
    # stringified hints ('pd.Series') don't resolve at worker import
    def _dtw_batch(pa_s, pb_s):
        pa = np.stack(pa_s.to_numpy()).astype(np.int64)
        pb = np.stack(pb_s.to_numpy()).astype(np.int64)
        n, m = pa.shape
        prev = np.full((n, m + 1), _DTW_INF, dtype=np.int64)
        prev[:, 0] = 0
        for i in range(m):
            cost = np.abs(pa[:, i : i + 1] - pb)
            cur = np.full((n, m + 1), _DTW_INF, dtype=np.int64)
            for j in range(1, m + 1):
                best = np.minimum(
                    np.minimum(prev[:, j], prev[:, j - 1]), cur[:, j - 1]
                )
                cur[:, j] = cost[:, j - 1] + best
            prev = cur
        return pd.Series(prev[:, m])

    dtw_udf = pandas_udf(_dtw_batch, "long")
    return (
        a.join(b, (F.col("peak_hour") == F.col("peak_b"))
               & (F.col("user_a") < F.col("user_b")))
        .select(
            "user_a", "user_b", "peak_hour",
            dtw_udf("pa", "pb").alias("dtw_dist"),
        )
    )


# CUSUM constants — all exact doubles, so both engines run the
# identical IEEE op sequence: k is the drift allowance (slightly above
# the corpus value mean, so the statistic resets between bursts), h
# the alarm threshold. The alarm COMPARE happens on the floored
# integer micro-units, never on a raw double.
_CUSUM_K = 56.0
_CUSUM_H_MICRO = 250_000_000  # h = 250.0 in micro-units


@query(
    "cusum_changepoint",
    oracle=f"""
    WITH ord AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ), lists AS (
      SELECT user_id,
             list(value ORDER BY rn) AS xs,
             list(event_id ORDER BY rn) AS eids
      FROM ord GROUP BY user_id
    ), expanded AS (
      SELECT user_id, xs, eids,
             unnest(generate_series(1, len(xs))) AS i
      FROM lists
    ), stat AS (
      SELECT user_id,
             CAST(eids[i] AS BIGINT) AS event_id,
             CAST(FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs[1:i]),
                                    (acc, x) -> greatest(CAST(0.0 AS DOUBLE),
                                                         acc + x - {_CUSUM_K}))
                        * 1000000.0) AS BIGINT)
               AS cusum_micro
      FROM expanded
    )
    SELECT user_id, event_id, cusum_micro,
           cusum_micro > {_CUSUM_H_MICRO} AS alarm
    FROM stat
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint statistic per user (Page 1954) —
    the standard sequential detector for upward level shifts in a
    behavioral metric (spend spikes, abuse bursts, sensor drift).
    The recursion s_0 = 0, s_t = max(0, s_{{t-1}} + x_t − k) runs
    with k = 56.0 (an exact double just above the corpus value mean,
    so the statistic drains between bursts); a row alarms when the
    statistic exceeds h = 250. Like `ewma_event_values`, both
    engines evaluate the IDENTICAL IEEE sequence in the identical
    (ts, event_id) order — the Python loop here, a sequential
    list_reduce with a prepended 0.0 seed in the oracle — so every
    intermediate is bit-identical and the output can be FLOORED
    integer micro-units with the alarm compare done on integers.

    Scale shape: one shuffle on user_id into applyInPandas groups;
    the recursion is sequential within a user but users are
    independent, so throughput scales with the key space (the EWMA
    scale argument, measured 8.6× at the 100× probe for the shared
    kernel shape). No closed form exists for max-clamped sums —
    this op is WHY the per-key sequential kernel pattern earns its
    place next to the window functions."""
    import math

    import pandas as pd

    events = load_table(spark, sf_dir, "events")

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        out, acc = [], 0.0
        for x in pdf["value"]:
            acc = max(0.0, acc + x - _CUSUM_K)
            out.append(math.floor(acc * 1000000.0))
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "cusum_micro": out,
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .applyInPandas(cusum, "user_id long, event_id long, cusum_micro long")
        .withColumn("alarm", F.col("cusum_micro") > F.lit(_CUSUM_H_MICRO))
    )


# Holt's linear-trend constants — exact dyadic doubles (the EWMA/CUSUM
# cross-engine-exact requirement): alpha smooths the level, beta the
# trend.
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.25


@query(
    "holt_linear_trend",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ), lists AS (
      SELECT user_id,
             list(value ORDER BY rn) AS xs,
             list(event_id ORDER BY rn) AS eids
      FROM ord GROUP BY user_id
    ), expanded AS (
      SELECT user_id, xs, eids,
             unnest(generate_series(1, len(xs))) AS i
      FROM lists
    ), st AS (
      SELECT user_id,
             CAST(eids[i] AS BIGINT) AS event_id,
             list_reduce(
               list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                            list_transform(xs[2:i],
                                            x -> [x, CAST(0.0 AS DOUBLE)])),
               (acc, e) -> [
                 0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                 0.25 * (0.5 * e[1] + 0.5 * (acc[1] + acc[2]) - acc[1])
                   + 0.75 * acc[2]
               ]) AS s
      FROM expanded
    )
    SELECT user_id, event_id,
           CAST(FLOOR(s[1] * 1000000.0) AS BIGINT) AS level_micro,
           CAST(FLOOR(s[2] * 1000000.0) AS BIGINT) AS trend_micro,
           CAST(FLOOR((s[1] + s[2]) * 1000000.0) AS BIGINT) AS forecast_micro
    FROM st
    """,
)
def holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957)
    per user: level l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}) and trend
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, seeded l_1 = x_1, b_1 = 0,
    with α = 0.5, β = 0.25 — the one-step forecast l+b is the
    standard trending-metric predictor EWMA can't give (EWMA lags a
    ramp by a constant; Holt tracks it). Same cross-engine-exact
    discipline as `ewma_event_values`/`cusum_changepoint`: dyadic
    constants, identical IEEE op order, floored integer micro-units.

    The oracle's fold state is (level, trend) — a 2-element DOUBLE
    LIST accumulator, deliberately NOT a STRUCT: DuckDB 1.0.0's
    list_reduce evaluates struct_pack fields against an accumulator
    it mutates field-by-field, so a `b :=` expression referencing
    acc.l reads the freshly-written NEW level (minimal repro: fold
    (acc, e) -> struct_pack(l := acc.l + e.l, b := acc.l) over 3+
    elements returns b == the final l). List elements don't alias
    that way — regression-pinned in test_corpus_ops.

    Scale shape: identical to the EWMA kernel — one shuffle on
    user_id into applyInPandas groups, sequential within a key,
    parallel across keys (measured 8.6× at the 100× probe for this
    kernel shape)."""
    import math

    import pandas as pd

    events = load_table(spark, sf_dir, "events")

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        lvl = trd = fc = None
        out_l, out_t, out_f = [], [], []
        for x in pdf["value"]:
            if lvl is None:
                lvl, trd = x, 0.0
            else:
                new_l = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (lvl + trd)
                trd = _HOLT_BETA * (new_l - lvl) + (1 - _HOLT_BETA) * trd
                lvl = new_l
            out_l.append(math.floor(lvl * 1000000.0))
            out_t.append(math.floor(trd * 1000000.0))
            out_f.append(math.floor((lvl + trd) * 1000000.0))
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "level_micro": out_l,
                "trend_micro": out_t,
                "forecast_micro": out_f,
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .applyInPandas(
            holt,
            "user_id long, event_id long, level_micro long, "
            "trend_micro long, forecast_micro long",
        )
    )


@query(
    "attribution_time_decay",
    oracle="""
    WITH cand AS (
      SELECT p.event_id AS purchase_id,
             v.event_id AS view_id,
             CAST(1000000 AS BIGINT) >> CAST(
               (CAST(floor(date_part('epoch', p.ts)) AS BIGINT)
                - CAST(floor(date_part('epoch', v.ts)) AS BIGINT)) // 86400
               AS INT) AS weight_ppm
      FROM events p
      JOIN events v
        ON v.user_id = p.user_id
       AND v.event_type = 'view'
       AND v.ts <= p.ts
       AND v.ts >= p.ts - INTERVAL '3 days'
      WHERE p.event_type = 'purchase'
    ), tot AS (
      SELECT *, SUM(weight_ppm) OVER (PARTITION BY purchase_id) AS total_ppm
      FROM cand
    )
    SELECT purchase_id, view_id,
           weight_ppm,
           CAST((weight_ppm * 1000000) // total_ppm AS BIGINT) AS share_ppm
    FROM tot
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every view inside the
    3-day lookback shares a purchase's credit, halving per elapsed
    day — the standard middle ground between last-touch (100% to one
    row) and linear (flat split). The decay weight is an INTEGER
    BIT-SHIFT, 1000000 >> floor(Δseconds/86400), and the normalized
    share an integer division (weight·10⁶ // Σweights) — so unlike
    textbook exp(−Δt/τ) implementations the whole op is exact
    integer arithmetic, no cross-engine exp()/rounding hazard
    anywhere (the exp curve is sampled at day granularity, which is
    what marketing reporting buckets by anyway).

    Scale shape: same bounded candidate join as
    `attribution_last_touch` (user-keyed shuffle, 3-day predicate
    prunes fan-out), then one per-purchase window SUM — no top-1
    limit here since every candidate row IS output. Purchases with
    no prior view drop out (inner join)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    _attribution_pair_budget(e)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    cand = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 3 DAYS")),
    ).select(
        "purchase_id",
        "view_id",
        F.expr(
            "CAST(shiftright(1000000, CAST((unix_timestamp(purchase_ts)"
            " - unix_timestamp(view_ts)) div 86400 AS INT)) AS BIGINT)"
        ).alias("weight_ppm"),
    )
    w = Window.partitionBy("purchase_id")
    return cand.withColumn("total_ppm", F.sum("weight_ppm").over(w)).select(
        "purchase_id",
        "view_id",
        F.col("weight_ppm").cast("bigint").alias("weight_ppm"),
        F.expr("CAST((weight_ppm * 1000000) div total_ppm AS BIGINT)").alias(
            "share_ppm"
        ),
    )


@query(
    "rolling_median",
    oracle="""
    WITH win AS (
      SELECT user_id, event_id,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS s
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id,
           CASE WHEN len(s) % 2 = 1 THEN s[(len(s) + 1) // 2]
                ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) * 0.5
           END AS med5
    FROM win
    """,
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-event median of each user's values — the robust
    de-noising window (a spike moves a rolling mean, not a rolling
    median). Neither engine has a native median WINDOW function with
    identical interpolation semantics (DuckDB's quantile_cont
    interpolates a + (b−a)·q, a DIFFERENT float expression than
    (a+b)/2), so BOTH sides build the frame explicitly — collect the
    ≤5-row frame, sort it, pick the middle (odd) or average the two
    middles with the same (a+b)·0.5 expression (even) — making every
    output either a selected input double or one identical IEEE
    add+mul. No rounding needed.

    Scale shape: one user-keyed shuffle + one window pass; the frame
    is O(1) rows so the collect_list per row is bounded — this is the
    standard frame-aggregate pattern, not a per-key re-sort."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("s", F.sort_array(F.collect_list("value").over(w)))
        .select(
            "user_id",
            "event_id",
            F.expr(
                "CASE WHEN size(s) % 2 = 1"
                " THEN element_at(s, CAST((size(s) + 1) div 2 AS INT))"
                " ELSE (element_at(s, CAST(size(s) div 2 AS INT))"
                "       + element_at(s, CAST(size(s) div 2 + 1 AS INT))) * 0.5 END"
            ).alias("med5"),
        )
    )


@query(
    "sequence_motifs",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(s) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'v+c+p')) AS BIGINT)
             AS n_funnel_motifs,
           CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT)
             AS n_error_bursts
    FROM seq
    """,
)
def sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex motif mining over per-user event-type sequences — the
    lightweight MATCH_RECOGNIZE: encode each event as its type's
    initial (c/e/p/s/v, distinct initials by schema), order by
    (ts, event_id), and count non-overlapping regex matches. Two
    motifs ship: the contiguous funnel v+c+p (view-streak straight
    into click-streak into purchase — stricter than `funnel_steps`'
    first-touch ordering, which tolerates noise between stages) and
    the error burst ee+. Java regex and RE2 agree on this
    anchor-free, backreference-free subset (leftmost non-overlapping
    scan, greedy +) — the same portability argument as `pii_scrub`.

    Scale shape: one user-keyed aggregate builds the code string
    (array_sort of (ts, event_id, code) structs → join — per-user
    sequences are session-scale, the same boundedness every
    sessionization op here assumes), then per-row regexp_count.
    Sequences shuffle once; no UDF, no driver state."""
    e = load_table(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias("t"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(t)), x -> x.c)"), ""
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("bigint").alias("seq_len"),
        F.regexp_count("s", F.lit("v+c+p")).cast("bigint").alias("n_funnel_motifs"),
        F.regexp_count("s", F.lit("ee+")).cast("bigint").alias("n_error_bursts"),
    )


@query(
    "running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM flagged
    """,
)
def running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct event-type count per user at every event —
    the breadth-of-engagement feature (how many product surfaces has
    this user touched so far). COUNT(DISTINCT) OVER a running frame
    doesn't exist in Spark (and materializing per-row distinct sets
    would be quadratic anywhere), so the op uses the standard exact
    reformulation: flag each (user, type)'s FIRST occurrence with one
    row_number window, then a running SUM of flags on the (ts,
    event_id) total order. Two windows, both partitioned by user —
    one shuffle end to end, all-integer output.

    At 100 TB the same rewrite is why running-distinct stays linear:
    the flag pass is a per-(user,type) top-1 (WindowGroupLimit
    heaps), and the running sum never holds more state than a
    counter."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias("n_types_seen"),
    )
