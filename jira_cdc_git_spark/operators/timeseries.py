"""Event-time operators over the `events` table (SURVEY §2.8 extension
surface: tumbling/sliding/session windows, as-of joins).

The reference has no event-time windowing (its CDC is polling incremental
sync); these are the extension operators the north star requires, written
so the batch formulation is oracle-checkable and the streaming formulation
(streaming/pipeline.py) shares the same aggregation expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jira_cdc_git_spark.functions.text import round_half_up as TX_round
from jira_cdc_git_spark.sources.registry import load_table, load_table_spread


def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch equivalent of
    `groupBy(window(ts, '1 hour'))`). date_trunc keeps the key a plain
    timestamp so the DuckDB oracle compares directly. One shuffle on
    (hour, type); partial agg runs map-side."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, sliding 30 min) via F.window — each event
    lands in 2 windows. Output window start as timestamp."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def _with_session_ids(ev: DataFrame, gap_minutes: int) -> DataFrame:
    """Shared session-id pass (sessionize + the range-join interval
    builder): lag + cumulative-sum-of-gap-flags over one user-key
    shuffle."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: split each user's event stream on inactivity gaps
    > gap_minutes (batch analog of `session_window`; SURVEY §2.8 note).
    lag + cumulative-sum-of-gap-flags — two window passes over one
    user-key shuffle. At 100 TB: partition by user bucket; per-user data
    fits easily (sessions are short)."""
    ev = load_table(spark, "events", sf_dir)
    with_sid = _with_session_ids(ev, gap_minutes)
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def asof_last_error_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the most recent error event of
    the same user at-or-before it (Spark lacks a native as-of join — SURVEY
    §2.9 / guide pattern). Composition strategy: tag the union, carry the
    last non-null error timestamp forward with an unbounded-preceding
    window, keep purchases. ONE shuffle on user_id — strictly better at
    scale than a range self-join, and no driver-side loop."""
    ev = load_table(spark, "events", sf_dir)
    sub = ev.filter(F.col("event_type").isin("purchase", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = sub.withColumn(
        "last_error_ts",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_error_ts"
    )


def range_join_concurrency(
    spark: SparkSession,
    sf_dir: str,
    bucket_minutes: int = 60,
    gap_minutes: int = 30,
) -> DataFrame:
    """Bucketed RANGE JOIN — the interval-overlap join Spark has no native
    operator for (Databricks exposes it as a range-join hint; open-source
    Spark executes a naive ts-between join as BroadcastNestedLoop or a
    cartesian). For every purchase event, count how many OTHER users had
    a session interval covering that instant ("site concurrency at
    purchase time").

    The trick: sessions explode into coarse time buckets
    (floor(start/B)..floor(end/B)); each event joins on ITS bucket only —
    an EQUI-join on the bucket key — then the exact start<=ts<=end
    predicate refines the candidates. A session covering the event's
    instant covers the event's bucket exactly once, so no post-join dedup
    is needed. Bucket width B trades explode factor (span/B rows per
    session) against candidate density (events x sessions per bucket);
    hot buckets are ordinary shuffle skew that AQE splits.

    100 TB shape: one user-key shuffle for sessionization, one bucket-key
    shuffle for the join — never a nested-loop; the per-bucket candidate
    product is the tunable cost knob."""
    ev = load_table(spark, "events", sf_dir)
    b = bucket_minutes * 60
    sess = (
        _with_session_ids(ev, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.col("ts").cast("long")).alias("start_s"),
            F.max(F.col("ts").cast("long")).alias("end_s"),
        )
    )
    buckets = sess.select(
        F.col("user_id").alias("s_user"),
        "start_s",
        "end_s",
        F.explode(
            F.sequence(
                F.floor(F.col("start_s") / b), F.floor(F.col("end_s") / b)
            )
        ).alias("bucket"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts").cast("long").alias("es"),
        F.floor(F.col("ts").cast("long") / b).alias("bucket"),
    )
    cand = p.join(buckets, "bucket").filter(
        (F.col("s_user") != F.col("user_id"))
        & (F.col("es") >= F.col("start_s"))
        & (F.col("es") <= F.col("end_s"))
    )
    counts = cand.groupBy("event_id").agg(F.count("*").alias("n"))
    return (
        p.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_concurrent"),
        )
    )


def value_anomalies(
    spark: SparkSession, sf_dir: str, z_threshold: float = 3.0
) -> DataFrame:
    """Per-user z-score anomaly detection over event values — the
    monitoring primitive behind alerting on a metrics stream: flag events
    whose value sits more than z_threshold population-standard-deviations
    from the user's own mean. Users with zero variance (or a single
    event) produce no defined score and are never flagged.

    100 TB shape: one user-key aggregation (map-side partial) broadcast
    back... no — joined back on user_id: the stats frame is
    users-cardinality, the join shuffles on the same key as the agg, and
    AQE broadcasts it when small. All built-ins, one shuffle key."""
    ev = load_table(spark, "events", sf_dir)
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
        F.count("*").alias("n_events"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(stats, "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.when(F.col("sigma") > 0, TX_round(z, 4)).alias("zscore"),
            F.when(
                F.col("sigma") > 0, F.abs(z) > z_threshold
            ).otherwise(F.lit(False)).alias("is_anomaly"),
        )
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis per session: view → click → purchase, each
    stage counted only when it happens strictly AFTER the previous stage
    completed (the product-analytics operator warehouses ship as
    `windowFunnel`). Emits one row per session with the stage timestamps
    and the depth reached.

    Implementation: within each session (the shared _with_session_ids
    pass), stage 1 = earliest view; stage 2 = earliest click after stage
    1; stage 3 = earliest purchase after stage 2 — three conditional
    min-aggregations over one (user, session) grouping; the ordering
    constraint is expressed with min(CASE WHEN ts > prior_stage) via a
    self-join-free double aggregation (two grouped passes joined on the
    session key, both shuffling on the same key).

    100 TB shape: two aggregations and one join, all keyed on
    (user_id, session_seq) — a single shuffle key end-to-end."""
    ev = load_table(spark, "events", sf_dir)
    sid = _with_session_ids(ev, 30).select(
        "user_id", "session_seq", "event_type", "ts"
    )
    keys = ["user_id", "session_seq"]
    first_view = sid.filter(F.col("event_type") == "view").groupBy(*keys).agg(
        F.min("ts").alias("view_ts")
    )
    after_view = (
        sid.join(first_view, keys)
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts")))
        .groupBy(*keys)
        .agg(F.min("ts").alias("click_ts"))
    )
    after_click = (
        sid.join(after_view, keys)
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy(*keys)
        .agg(F.min("ts").alias("purchase_ts"))
    )
    sessions = sid.groupBy(*keys).agg(F.count("*").alias("n_events"))
    depth = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("view_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        sessions.join(first_view, keys, "left")
        .join(after_view, keys, "left")
        .join(after_click, keys, "left")
        .select(
            "user_id",
            "session_seq",
            "n_events",
            "view_ts",
            "click_ts",
            "purchase_ts",
            depth.cast("int").alias("funnel_depth"),
        )
    )


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type statistics: exact p05/p95 (R-7 interpolation
    — differentially verifiable against quantile_cont), the winsorized
    mean (values clipped into [p05, p95] before averaging), and the
    trimmed count outside the fences — the outlier-robust aggregation a
    metrics pipeline uses where plain avg() is skew-dominated.

    100 TB shape: two grouped passes on the same key (percentiles, then
    clip+avg with the tiny percentile frame joined back — AQE broadcasts
    it); swap percentile() for percentile_approx at extreme group sizes,
    as doc_length_quantiles documents."""
    ev = load_table(spark, "events", sf_dir)
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.05D, 0.95D))").alias("q")
    ).select(
        "event_type",
        F.col("q")[0].alias("p05"),
        F.col("q")[1].alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(q, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            TX_round(F.first("p05"), 4).alias("p05"),
            TX_round(F.first("p95"), 4).alias("p95"),
            TX_round(F.avg("value"), 4).alias("mean_raw"),
            TX_round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.sum(
                (
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95"))
                ).cast("long")
            ).alias("n_clipped"),
        )
    )


def asof_within_tolerance(
    spark: SparkSession, sf_dir: str, tolerance_minutes: int = 60
) -> DataFrame:
    """As-of join with a staleness tolerance: the matched error timestamp
    only counts when it is within `tolerance_minutes` of the purchase —
    otherwise NULL (the sensor-fusion form of as-of: a reading older
    than the tolerance is no reading). Same single user-key shuffle as
    asof_last_error_before_purchase; the tolerance is a post-hoc
    projection, not a join-condition change."""
    base = asof_last_error_before_purchase(spark, sf_dir)
    fresh = (
        F.col("ts").cast("long") - F.col("last_error_ts").cast("long")
        <= tolerance_minutes * 60
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_error_ts")).alias("recent_error_ts"),
        F.coalesce(fresh, F.lit(False)).alias("has_recent_error"),
    )


def funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level funnel conversion table: session counts per reached
    stage and step conversion rates — the one-screen rollup of
    funnel_conversion (stage N rate = sessions reaching N / sessions
    reaching N-1). One extra tiny aggregation over the per-session
    frame."""
    per_session = funnel_conversion(spark, sf_dir)
    agg = per_session.agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("funnel_depth") >= 1).cast("long")).alias("n_view"),
        F.sum((F.col("funnel_depth") >= 2).cast("long")).alias("n_click"),
        F.sum((F.col("funnel_depth") >= 3).cast("long")).alias("n_purchase"),
    )
    return agg.select(
        "n_sessions",
        "n_view",
        "n_click",
        "n_purchase",
        TX_round(F.col("n_view") / F.col("n_sessions"), 4).alias("view_rate"),
        TX_round(
            F.when(F.col("n_view") > 0, F.col("n_click") / F.col("n_view")),
            4,
        ).alias("click_through"),
        TX_round(
            F.when(
                F.col("n_click") > 0, F.col("n_purchase") / F.col("n_click")
            ),
            4,
        ).alias("purchase_through"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix — the canonical product-analytics
    rollup: users are cohorted by their first-activity week, and each
    (cohort_week, week_offset) cell counts how many of that cohort were
    active offset weeks later, as an absolute count and as a fraction of
    the cohort. (Swap user_id for a crawl source and ts for dump date
    and the same matrix tracks how long content sources keep
    contributing to a training corpus.)

    100 TB shape: activity collapses to distinct (user, week) via one
    partial-agg shuffle; the cohort map is a user-keyed min; the join
    back is user-keyed (colocatable with the activity shuffle); the
    final matrix is a (cohort, offset) partial agg over
    user-week-bounded rows. Cohort sizes broadcast."""
    ev = load_table(spark, "events", sf_dir)
    weeks = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("int").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.col("cohort_size").cast("int").alias("cohort_size"),
            TX_round(
                F.col("n_active") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


def decayed_engagement(
    spark: SparkSession, sf_dir: str, half_life_hours: float = 24.0
) -> DataFrame:
    """Per-user exponentially time-decayed engagement score — the
    recency-weighted activity feature an ML pipeline derives from an
    event stream (a click yesterday counts ~2x a click two days ago at a
    24 h half-life):

        score(u) = sum_j value_j * 2^(-(T - t_j) / half_life)

    with T = the corpus's max event time (one global scalar, broadcast).
    Expressing the decay against a FIXED reference turns the classic
    recursive EMA into a plain weighted SUM — one partial-agg shuffle on
    user_id, no ordered per-user fold, which is what makes it linear at
    100 TB (the recursive form needs a sequential pass per user).

    Weights are exp(ln2 * -age/hl) <= 1 and per-user term counts are
    bounded, so the double sum is stable; 6-dp half-up rounding absorbs
    engine-order ulp differences (the shard_drift_report discipline)."""
    ev = load_table(spark, "events", sf_dir)
    tmax = ev.agg(F.max("ts").alias("t_ref"))
    age_h = (
        F.col("t_ref").cast("double") - F.col("ts").cast("double")
    ) / 3600.0
    w = F.exp(F.lit(-0.6931471805599453) * age_h / half_life_hours)
    return (
        ev.crossJoin(F.broadcast(tmax))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            TX_round(F.sum(F.col("value") * w), 6).alias("decayed_score"),
        )
    )


def mad_thresholds(ev: DataFrame) -> DataFrame:
    """Per-event-type robust location/scale: m = exact median(value),
    mad = exact median(|value - m|). The tiny (event_type, med, mad)
    frame IS the trained anomaly model — shared by the batch operator
    and the stream-static twin so both score identically."""
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5D)").alias("mad"),
        )
    )


def mad_score_frame(batch: DataFrame, thresholds: DataFrame) -> DataFrame:
    """Score a (event_id, event_type, value, ...) frame against trained
    MAD thresholds: Iglewicz-Hoaglin modified z, rounded half-up at
    4 dp. One broadcast join + narrow expressions."""
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return batch.join(F.broadcast(thresholds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        TX_round(z, 4).alias("robust_z"),
    )


def mad_anomalies(
    spark: SparkSession, sf_dir: str, cutoff: float = 3.5
) -> DataFrame:
    """Median/MAD robust outliers per event type (Iglewicz-Hoaglin
    modified z-score) — the skew-immune sibling of value_anomalies'
    mean/stddev z-score: a single pathological burst moves a mean but
    not a median, so MAD flags the burst instead of hiding inside an
    inflated sigma.

        m = median(value);  mad = median(|value - m|)
        robust_z = 0.6745 * (value - m) / mad;  flag |z| > 3.5

    Shape: two grouped exact-percentile passes on the same key (the
    winsorized_stats discipline — percentile, join the tiny per-type
    frame back via AQE broadcast, percentile of the residual, join
    again), then one narrow scoring pass. Groups are event types —
    cardinality is bounded, so exact percentile is fine at any corpus
    size; percentile_approx is the drop-in at extreme group widths."""
    ev = load_table(spark, "events", sf_dir)
    return mad_score_frame(ev, mad_thresholds(ev)).filter(
        F.abs(F.col("robust_z")) > cutoff
    )


def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: the gap between a
    user's consecutive events of the same type (lag over the per-user
    stream), aggregated to exact p50/p90 and mean seconds — the
    arrival-process health view (bursts shrink p50, stragglers stretch
    p90) that complements sessionize's gap-threshold cut with the
    distribution the threshold should be read from.

    100 TB shape: the lag window partitions by (user_id, event_type) —
    per-user streams are bounded; the rollup is one |event_types|-
    bounded exact-percentile aggregation (winsorized_stats precedent).
    Mean is a double sum rounded half-up at 4 dp."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "event_id", F.col("ts").cast("double").alias("tsd")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("tsd", "event_id")
    gaps = ev.withColumn("gap", F.col("tsd") - F.lag("tsd").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        TX_round(F.expr("percentile(gap, 0.5D)"), 4).alias("p50_gap_s"),
        TX_round(F.expr("percentile(gap, 0.9D)"), 4).alias("p90_gap_s"),
        TX_round(F.avg("gap"), 4).alias("mean_gap_s"),
    )


def conversion_latency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-to-purchase conversion latency: for every purchase preceded
    by an error (the proven as-of join), the elapsed seconds — rolled up
    to count, exact p50/p90 and mean. The "how long does recovery take"
    summary a funnel owner reads next to funnel_conversion's rates.

    Round-6 registration backlog: implemented + DuckDB-parity-tested now
    (tests/test_operators.py, CONVERSION_LATENCY_ORACLE); registers when
    the driver window frees.

    100 TB shape: inherits the as-of join's single user-key shuffle; the
    rollup is a 1-row global aggregate (exact percentile over the
    purchase subset — swap percentile_approx at extreme scale)."""
    asof = asof_last_error_before_purchase(spark, sf_dir).filter(
        F.col("last_error_ts").isNotNull()
    )
    lat = F.col("ts").cast("double") - F.col("last_error_ts").cast("double")
    return asof.select(lat.alias("lat")).agg(
        F.count("*").alias("n_conversions"),
        TX_round(F.expr("percentile(lat, 0.5D)"), 4).alias("p50_latency_s"),
        TX_round(F.expr("percentile(lat, 0.9D)"), 4).alias("p90_latency_s"),
        TX_round(F.avg("lat"), 4).alias("mean_latency_s"),
    )


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next_type | type) from consecutive event pairs (lag/lead over the
    user timeline). The behavioral fingerprint that funnels and anomaly
    scores read from — and, on a training-data pipeline, the same shape
    models token-class or page-category transition priors.

    100 TB shape: one user-key window (per-user streams bounded), one
    |types|^2-bounded aggregation; probabilities are per-row divisions
    of exact counts — no order-dependent float math anywhere."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        TX_round(F.col("n") / F.sum("n").over(wt), 6).alias("prob"),
    )


#: CUSUM drift allowance k and alarm threshold h, in z-score units
#: (Page 1954 defaults: k = 0.5 sigma, h = 5 sigma). Mirrored by the
#: oracle.
CUSUM_K = 0.5
CUSUM_H = 5.0
#: integer micro-units for the cumulative sums (exact cross-engine adds).
CUSUM_UNIT = 1_000_000


def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection (Page 1954) over the hourly
    event-count series per event type: S_t = max(0, S_{t-1} + z_t - k),
    alarm when S_t > h. The standard drift detector for rate regime
    shifts (a crawler source going dark, a spam burst) that value_
    anomalies' pointwise z-score cannot see.

    CROSS-ENGINE DETERMINISM: the recursion has the closed form
    S_t = C_t - min(0, min_{j<=t} C_j) with C the prefix sum of
    (z_t - k). z_t quantizes to CUSUM_UNIT integer micro-units per row
    (fixed-shape IEEE expression), so the prefix sum and running min
    are exact integer window aggregates — identical on both engines.

    100 TB shape: one (type, hour) partial aggregation, one broadcast
    of |types| mean/std rows, one per-type ordered window (bounded
    series length); no self-joins."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
    ).agg(F.count("*").cast("long").alias("n"))
    # mu/sigma from exact integer moment sums (sum n, sum n^2, count) —
    # a library stddev_pop accumulates doubles in engine-specific order;
    # this fixed expression over exact integers is bit-identical on both
    # engines.
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count("*").alias("cnt"),
    )
    mu = F.col("s1") / F.col("cnt")
    sigma = F.sqrt(F.col("s2") / F.col("cnt") - mu * mu)
    scored = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "zk_u",
        F.floor(
            ((F.col("n") - mu) / sigma - F.lit(CUSUM_K))
            * F.lit(float(CUSUM_UNIT))
        ).cast("long"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = scored.withColumn("c_u", F.sum("zk_u").over(w)).withColumn(
        "floor_u", F.least(F.lit(0).cast("long"), F.min("c_u").over(w))
    )
    return cum.select(
        "event_type",
        "hour_ts",
        "n",
        TX_round(
            (F.col("c_u") - F.col("floor_u")) / F.lit(float(CUSUM_UNIT)), 6
        ).alias("cusum"),
        (
            (F.col("c_u") - F.col("floor_u"))
            > F.lit(int(CUSUM_H * CUSUM_UNIT)).cast("long")
        ).alias("is_changepoint"),
    )


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with last-observation-carried-forward per user:
    generate each user's min..max hour spine, keep the last observed
    value in each hour (row_number over (ts, event_id) — deterministic),
    and carry it across empty hours (last_value IGNORE NULLS). The
    hypertable resample/gap-fill primitive (TimescaleDB's locf +
    time_bucket_gapfill) for turning event streams into aligned series.

    100 TB shape (r9 rewrite): the dense |users| x |hours| grid is the
    OUTPUT, so it must exist — but it need never be SHUFFLED. The
    original formulation joined a generated spine against the hourly
    observations and ran LOCF over the dense frame (two exchanges of
    grid-sized data; the 10x probe held a consistent ~8x ratio — real
    growth, not noise). This form computes lead(next observed hour)
    over the SPARSE hourly observations (one user-key shuffle of
    observation-sized data) and then explodes each observation across
    the hours it covers — the grid materializes post-shuffle, inside
    the final projection, and LOCF holds by construction. The in-hour
    dedup stays a partial TakeOrdered per (user, hour) group."""
    ev = load_table(spark, "events", sf_dir)
    w_last = Window.partitionBy("user_id", "hour_ts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly_last = (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour_ts", F.col("value").alias("obs_value"))
    )
    return locf_from_hourly(hourly_last)


def locf_from_hourly(hourly_last: DataFrame) -> DataFrame:
    """The carry-and-tile projection from a (user_id, hour_ts,
    obs_value) last-observation frame — shared by the batch operator
    and streaming_gap_fill_locf so the twin's snapshot agrees by
    construction (the acf_from_hourly discipline)."""
    # Each user's first observed hour IS the spine start (min(ts) lands
    # in an observed hour), so carrying each observation up to the hour
    # before the next one tiles the user's min..max range exactly —
    # identical rows to the spine-join + IGNORE-NULLS-last formulation.
    w_lead = Window.partitionBy("user_id").orderBy("hour_ts")
    return (
        hourly_last.withColumn("next_hour", F.lead("hour_ts").over(w_lead))
        .select(
            "user_id",
            F.col("hour_ts").alias("obs_hour"),
            # carried raw doubles — bit-identical on both engines, no
            # rounding needed (never an aggregate)
            F.col("obs_value"),
            F.explode(
                F.sequence(
                    F.col("hour_ts"),
                    F.coalesce(
                        F.col("next_hour") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour_ts"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour_ts"),
        )
        .select(
            "user_id",
            "hour_ts",
            F.col("obs_value").alias("value_filled"),
            (F.col("hour_ts") != F.col("obs_hour")).alias("is_gap"),
        )
    )


def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day seasonality profile per event type:
    count, share of the type's traffic, and mean value per cell — the
    seasonal-naive baseline every rate alarm (cusum_changepoints,
    value_anomalies) should be read against before paging anyone.

    CROSS-ENGINE DETERMINISM: values are 2-dp doubles, so they sum as
    exact integer cents (round-half-up per row, then BIGINT sum); the
    mean is one per-row division of exact integers. Day-of-week is
    Monday=0 on both engines (Spark weekday == DuckDB isodow-1).

    100 TB shape: one partial-agg groupBy to a |types| x 168 frame; the
    share join is a broadcast of |types| totals."""
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        "event_type",
        F.weekday("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    totals = cells.groupBy("event_type").agg(F.sum("n").alias("total"))
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n",
        TX_round(F.col("n") / F.col("total"), 6).alias("share"),
        TX_round(F.col("cents") / F.col("n") / 100.0, 4).alias("avg_value"),
    )


#: path length and top-k for event_paths_topk (mirrored by the oracle).
PATH_TOPK = 25


def event_paths_topk(
    spark: SparkSession, sf_dir: str, k: int = PATH_TOPK
) -> DataFrame:
    """Most frequent 3-step event-type paths across per-user streams
    (two stacked lead() windows + one count) — the sequence-mining
    staple behind "what do users do right before purchasing": funnels
    check ONE hypothesized order, paths surface the orders you didn't
    hypothesize.

    100 TB shape: one user-key window shuffle shared by both leads,
    one |types|^3-bounded aggregation, TakeOrderedAndProject for the k
    rows (ties break on the path itself)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .groupBy(
            F.col("event_type").alias("step1"),
            F.col("t2").alias("step2"),
            F.col("t3").alias("step3"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(k)
    )


#: co-activity constants (mirrored by the oracle): top-k, and the
#: hot-bucket cap — a bucket where more than this many users were
#: active carries no linking signal ("everyone was online at peak")
#: and would contribute degree^2 candidate pairs; dropping it is the
#: same prefix-filter/df-cap discipline as containment_pairs. Without
#: the cap the 10x scale probe measured a 22.9x blowup (quadratic in
#: bucket density); with it, per-bucket work is bounded by CAP^2.
COACTIVITY_TOPK = 100
COACTIVITY_BUCKET_CAP = 40


def user_coactivity_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = COACTIVITY_TOPK,
    max_bucket_users: int = COACTIVITY_BUCKET_CAP,
) -> DataFrame:
    """Bipartite projection of the user-x-(hour, event_type) activity
    matrix: pairs of users repeatedly active in the same hourly bucket
    with the same event type, top-k by shared-bucket count. The standard
    co-visitation / account-linking signal (and, on a crawl corpus, the
    same shape links mirrors that publish in lockstep).

    100 TB shape: the classic bounded self-join — distinct (bucket,
    user) first (collapses event volume), DROP buckets hotter than
    max_bucket_users (no signal, quadratic cost — the df-cap
    discipline), join on the bucket key, partial-agg count,
    TakeOrderedAndProject. At 10x+ traffic the hour buckets saturate
    and a production run narrows the bucket width instead — the cap
    makes the operator degrade to cheap-and-sparse rather than
    quadratic either way."""
    ev = load_table(spark, "events", sf_dir)
    act = (
        ev.select(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
            "user_id",
        )
        .distinct()
    )
    cool = (
        act.groupBy("hour_ts", "event_type")
        .agg(F.count("*").alias("bucket_users"))
        .filter(F.col("bucket_users") <= max_bucket_users)
        .select("hour_ts", "event_type")
    )
    act = act.join(cool, ["hour_ts", "event_type"], "left_semi")
    # Spread the bucket keys over the full shuffle-partition count
    # BEFORE the pair blowup: the per-bucket output is up to
    # max_bucket_users² rows, and AQE — seeing only the small distinct
    # input — coalesces the join to a couple of partitions that then
    # produce (and partially aggregate) every pair nearly single-task
    # (the theil_sen_trend lesson; guide §2.5 — partition for the
    # post-blowup size, not the input size). Bucket work is bounded by
    # the cap, so hashing buckets over n_part tasks parallelizes
    # cleanly at any scale.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    act = act.repartition(n_part, "hour_ts", "event_type")
    a = act.select("hour_ts", "event_type", F.col("user_id").alias("user_a"))
    b = act.select(
        F.col("hour_ts").alias("h2"),
        F.col("event_type").alias("e2"),
        F.col("user_id").alias("user_b"),
    )
    return (
        a.join(
            b,
            (a.hour_ts == b.h2)
            & (a.event_type == b.e2)
            & (a.user_a < b.user_b),
        )
        .groupBy("user_a", "user_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "user_a", "user_b")
        .limit(k)
    )


def burstiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor / index of dispersion) of each event
    type's hourly arrival counts: variance-to-mean from exact integer
    moment sums. A Poisson-ish arrival process sits near 1.0;
    overdispersion (bots, retry storms, thundering herds) pushes it up —
    the one-number triage read before cusum_changepoints' per-hour
    verdicts.

    100 TB shape: one (type, hour) partial agg, one |types|-row moment
    rollup; every float op is a fixed-shape expression over exact
    integers (the cusum sigma discipline)."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    m = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count("*").alias("cnt"),
    )
    mu = F.col("s1") / F.col("cnt")
    var = F.col("s2") / F.col("cnt") - mu * mu
    return m.select(
        "event_type",
        F.col("cnt").cast("long").alias("n_hours"),
        TX_round(mu, 4).alias("mean_hourly"),
        TX_round(var / mu, 4).alias("fano"),
        ((var / mu) > F.lit(1.5)).alias("is_bursty"),
    )


def session_entry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session rollup by ENTRY event type: which first action starts the
    longest / busiest sessions. Sessions come from the shared gap-cut
    pass (sessionize's engine); the entry event is the deterministic
    first row per (user, session) by (ts, event_id).

    100 TB shape: everything rides the one user-key shuffle the session
    cut already pays; the final rollup is |types|-bounded."""
    ev = load_table(spark, "events", sf_dir)
    sid = _with_session_ids(
        ev.select("user_id", "ts", "event_id", "event_type"), 30
    )
    w = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    sess = (
        sid.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", "session_seq")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
                "entry_type"
            ),
            F.count("*").alias("n_events"),
            (
                F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))
            ).alias("duration_sec"),
        )
    )
    return sess.groupBy("entry_type").agg(
        F.count("*").cast("long").alias("n_sessions"),
        TX_round(F.sum("n_events") / F.count("*"), 4).alias("mean_events"),
        TX_round(F.sum("duration_sec") / F.count("*"), 4).alias(
            "mean_duration_s"
        ),
    )


#: debounce window in seconds (mirrored by the oracle).
DEBOUNCE_S = 60


def debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce report: an event is suppressed when the same user fired
    the same event type within DEBOUNCE_S seconds before it — the
    dedup-by-recency pass every clickstream ingest runs (double-submits,
    retry storms) before counting anything. Reports kept/dropped per
    type; the keep rule is a single lag() predicate, shared verbatim
    with a streaming admission variant.

    NOTE the deliberate semantics: the window anchors on the PREVIOUS
    RAW event (lag), not the previous kept one — the standard cheap
    debounce (a fixpoint chain-suppression needs iteration; this is the
    one-pass form every stream processor ships).

    100 TB shape: one user-key window + a |types|-row rollup."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "kept", gap.isNull() | (gap > F.lit(DEBOUNCE_S))
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias(
            "n_kept"
        ),
        TX_round(
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)) / F.count("*"), 6
        ).alias("drop_rate"),
    )


#: equi-depth bin count (mirrored by the oracle).
EQUIDEPTH_BINS = 8


def value_equidepth_bins(
    spark: SparkSession, sf_dir: str, bins: int = EQUIDEPTH_BINS
) -> DataFrame:
    """Equi-depth histogram of the event value distribution: exact
    percentile edges at i/bins, every row assigned to its band with one
    narrow expression. This IS how a range partitioner picks split
    points at scale (Spark's RangePartitioner samples; this computes
    the exact edges in one aggregation) — the report to read before
    range-bucketing any heavy sort or write.

    100 TB shape: ONE exact-percentile aggregation broadcast as an
    edges array (swap percentile_approx at extreme scale), then a
    per-row fold over bins-1 edges — no global sort, no ntile window.

    Determinism: the percentile runs over exact INTEGER CENTS, where
    the shared (n-1)p interpolation at p = i/8 (binary-exact fractions)
    is EXACT double arithmetic on both engines — interpolating the raw
    2-dp doubles instead drifts an ulp and flips boundary rows (it did,
    at sf0.001). Bucket assignment compares exact values; min/max/count
    per band are exact."""
    ev = load_table(spark, "events", sf_dir).select(
        "value", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    qs = ", ".join(str(i / bins) for i in range(1, bins))
    edges = ev.agg(
        F.expr(f"percentile(cents, array({qs}))").alias("edges")
    )
    assigned = ev.crossJoin(F.broadcast(edges)).select(
        "value",
        (
            F.aggregate(
                F.filter("edges", lambda e: F.col("cents") > e),
                F.lit(0),
                lambda acc, _: acc + 1,
            )
            + 1
        )
        .cast("int")
        .alias("bin"),
    )
    return assigned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


def gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the concentration
    number behind every skew decision: G near 0 means uniform users
    (hash partitioning is fine), G near 1 means a few whales own the
    traffic (salt them). Exact rank formula over ascending-sorted
    per-user counts: G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n.

    CROSS-ENGINE DETERMINISM: ranks break ties on user_id; every sum is
    an exact integer; the final expression is per-row.

    100 TB shape: the ranked frame is |users|-bounded (already an
    aggregate), so the single-partition rank window is bounded work —
    the same justification as every vocab-bounded window here."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    w = Window.orderBy("x", "user_id")
    ranked = per_user.withColumn("i", F.row_number().over(w))
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("total_events"),
        TX_round(
            F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
            - (F.col("n") + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


def anomaly_consensus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector agreement audit: per event type, how often the pointwise
    z-score flag (|n - mu| > 3 sigma on hourly counts) and the CUSUM
    drift alarm fire on the same hours — the calibration read before
    trusting either alone (z catches spikes, CUSUM catches sustained
    shifts; high Jaccard agreement means the corpus only has spikes).

    Shares cusum_changepoints' exact-integer moment stats; the z
    predicate compares squared deviations so no sqrt enters the flag.

    100 TB shape: one (type, hour) partial agg reused by both arms, a
    broadcast |types|-row stats frame, and a |types|-row rollup."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count("*").alias("cnt"),
    )
    mu = F.col("s1") / F.col("cnt")
    var = F.col("s2") / F.col("cnt") - mu * mu
    z_flagged = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour_ts",
        # |n - mu| > 3 sigma, squared: no sqrt in the predicate
        ((F.col("n") - mu) * (F.col("n") - mu) > F.lit(9.0) * var).alias(
            "z_flag"
        ),
    )
    cus = cusum_changepoints(spark, sf_dir).select(
        "event_type", "hour_ts", F.col("is_changepoint").alias("c_flag")
    )
    both = z_flagged.join(cus, ["event_type", "hour_ts"])
    agg = both.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum(F.when(F.col("z_flag"), 1).otherwise(0)).cast("long").alias("n_z"),
        F.sum(F.when(F.col("c_flag"), 1).otherwise(0)).cast("long").alias(
            "n_cusum"
        ),
        F.sum(F.when(F.col("z_flag") & F.col("c_flag"), 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
    )
    denom = F.col("n_z") + F.col("n_cusum") - F.col("n_both")
    return agg.select(
        "event_type",
        "n_hours",
        "n_z",
        "n_cusum",
        "n_both",
        F.when(denom > 0, TX_round(F.col("n_both") / denom, 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard_agreement"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave: semi-structured property extraction (P2's JSON face)
# ---------------------------------------------------------------------------

def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction over the events JSON `props`
    column — the P2 custom-field probe (Unknowns map, pkg/client/
    client.go:340-349) in its JSON-string form: pull props.k, bucket it,
    and roll up count + total value per bucket. Proves get_json_object
    against an independent JSON reader (DuckDB's json_extract_string).

    CROSS-ENGINE DETERMINISM: values quantize to integer cents per row
    before the SUM (order-independent exact addition).

    100 TB shape: the JSON get is a narrow JVM-side expression (no UDF);
    one |buckets|-bounded partial aggregation."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(
            (k % 10).alias("k_bucket"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            TX_round(F.sum("cents") / 100.0, 2).alias("total_value"),
        )
    )


def rolling_daily_median(
    spark: SparkSession, sf_dir: str, window_rows: int = 7
) -> DataFrame:
    """Rolling 7-row median of daily event value per type — the smoothed
    baseline ops dashboards draw under the raw daily line (median, not
    mean, so single-day spikes don't drag the baseline; pairs with
    cusum_changepoints / value_anomalies).

    CROSS-ENGINE DETERMINISM: daily totals quantize to integer cents
    (exact SUM); the windowed median is an exact percentile over
    integers in a ROWS frame with a total order (day is unique per
    type), so Spark `percentile` == DuckDB `quantile_cont`.

    100 TB shape: one partial-agg to |types × days| rows, then windows
    partitioned by type — never a single global partition."""
    ev = load_table(spark, "events", sf_dir)
    # date_trunc (timestamp), not to_date: DATE round-trips as a pandas
    # Timestamp from DuckDB but a datetime.date from Spark — type-
    # mismatched hashes for equal values
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + 0.5).cast("long")
        ).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(window_rows - 1), 0)
    )
    return daily.select(
        "event_type",
        "day",
        TX_round(F.col("cents") / 100.0, 2).alias("day_value"),
        TX_round(
            F.expr("percentile(cents, 0.5D)").over(w) / 100.0, 2
        ).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave: statistical analytics (A/B z-test, correlation, bootstrap)
# ---------------------------------------------------------------------------

#: the two arms of the A/B value comparison
AB_ARM_A, AB_ARM_B = "purchase", "click"


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test between the value distributions of two event
    types — the experiment-analysis primitive every product pipeline
    runs. Single row: per-arm n / mean, the difference, and the z-score
    under unpooled variances (Welch).

    CROSS-ENGINE DETERMINISM: the five sufficient statistics per arm
    (n, Σcents, Σcents²) are exact integers (cents² fits int64: value
    ≤ ~10^4 cents → 10^8 per row, 10^18 at 10^10 rows); every derived
    quantity is one fixed-shape IEEE chain over them, identical on both
    engines.

    100 TB shape: one scan, 2-group partial agg — sufficient statistics
    ARE the point of this shape: no per-row second pass, no window."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    stats = (
        ev.select(
            "event_type",
            cents.alias("c"),
            (cents * cents).alias("c2"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("c").alias("s"),
            F.sum("c2").alias("s2"),
        )
    )
    a = stats.filter(F.col("event_type") == AB_ARM_A).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("s2").alias("s2_a"),
    )
    b = stats.filter(F.col("event_type") == AB_ARM_B).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("s2").alias("s2_b"),
    )
    j = a.crossJoin(F.broadcast(b))
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("s2_a") - F.col("s_a") * mean_a) / (F.col("n_a") - 1)
    var_b = (F.col("s2_b") - F.col("s_b") * mean_b) / (F.col("n_b") - 1)
    z = (mean_a - mean_b) / F.sqrt(
        var_a / F.col("n_a") + var_b / F.col("n_b")
    )
    return j.select(
        "n_a",
        "n_b",
        TX_round(mean_a / 100.0, 4).alias("mean_a"),
        TX_round(mean_b / 100.0, 4).alias("mean_b"),
        TX_round((mean_a - mean_b) / 100.0, 4).alias("mean_diff"),
        TX_round(z, 4).alias("z_score"),
    )


def event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix between DAILY COUNTS of event types —
    which behaviors co-move day over day (the input to any metric-
    forecasting or anomaly-attribution model). One row per unordered
    type pair (a < b).

    CROSS-ENGINE DETERMINISM: per-(day, type) counts are exact integers
    over the shared distinct-day grid (absent days count 0 via the
    grid join); the five correlation moments are exact-integer SUMs;
    r is one IEEE expression over them.

    100 TB shape: one partial agg to |days × types| rows, a grid
    outer-join against the (tiny, broadcast) day list, a |types|²-
    bounded pair join over day-aligned counts."""
    ev = load_table(spark, "events", sf_dir)
    day = F.date_trunc("DAY", F.col("ts")).alias("day")
    counts = ev.groupBy(day, "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    days = ev.select(day).distinct()
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    filled = grid.join(counts, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n", F.lit(0)).alias("n")
    )
    x = filled.select(
        "day", F.col("event_type").alias("type_a"), F.col("n").alias("xa")
    )
    y = filled.select(
        "day", F.col("event_type").alias("type_b"), F.col("n").alias("xb")
    )
    pairs = x.join(y, "day").filter(F.col("type_a") < F.col("type_b"))
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
    )
    # each variance term fits int64; their PRODUCT does not — cast each
    # to double before multiplying (identical cast point in the oracle)
    num = F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = (F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("nd") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(vx * vy)
    return m.select(
        "type_a",
        "type_b",
        "nd",
        TX_round(num / den, 6).alias("pearson_r"),
    )


#: Poisson(1) inverse-CDF thresholds for the deterministic bootstrap —
#: cumulative P(X <= k) for k = 0..4; u above the last bin draws 5.
#: Shared verbatim with the oracle (literal digits in both SQL strings).
POISSON_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
]
#: bootstrap resample count
BOOT_B = 32


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (Chamandy et al., the standard
    single-pass distributed bootstrap): per event type, B resample means
    of value where each row's weight in resample b is Poisson(1) drawn
    via the inverse CDF from a seeded md5 fraction — fully reproducible,
    no RNG state. Reports the mean and the exact p2.5/p97.5 envelope of
    the B resample means.

    CROSS-ENGINE DETERMINISM: weights derive from md5(event_id, g)
    (same digest both engines) sliced into FOUR independent 8-hex
    uniforms — one hash per four resamples, b = (g-1)·4 + j; each
    resample mean is exact-integer Σ(w·cents)/Σw; the envelope
    interpolates over B identical doubles with the same quantile
    formula.

    100 TB shape: one B-way explode (documented ×B linear pass), two
    partial aggs; no shuffle wider than |types × B|. The md5 is the
    per-row hot cost, so it is paid on N·B/4 rows (the digest-group
    explode) and the remaining ×4 fan-out is a cheap substring slice —
    a 4× cut in the dominant hashing work (r12: the probe's
    10.16× median on the old one-hash-per-resample form was the
    compute-bound-linear ceiling; less per-row compute = more
    overhead amortization at 10×).

    r13 (guide §2.5): the events scan arrives as 1-2 splits at bench
    SFs, so the N·B/4 md5 pyramid — the documented dominant cost — ran
    on 1-2 CORES (the core-underfill the r11/r12 probes kept reading
    as a near-superlinear ratio). load_table_spread parallelizes the
    explode across the cluster; on a real multi-split table the spread
    never fires. Values unchanged: the per-row weight derivation and
    all aggregates are key-determined exact integers."""
    ev = load_table_spread(spark, "events", sf_dir, "event_id")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    g = F.explode(
        F.sequence(F.lit(1), F.lit(BOOT_B // 4))
    ).alias("g")
    hashed = (
        ev.select("event_type", F.col("event_id"), cents.alias("c"))
        .select("event_type", "event_id", "c", g)
        .select(
            "event_type",
            "c",
            "g",
            F.md5(F.concat_ws("-", F.col("event_id"), F.col("g"))).alias(
                "h"
            ),
        )
    )
    j = F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j")
    base = hashed.select("event_type", "c", "g", "h", j).select(
        "event_type",
        "c",
        ((F.col("g") - 1) * 4 + F.col("j")).cast("long").alias("b"),
        F.expr("substring(h, (j - 1) * 8 + 1, 8)").alias("u8"),
    )
    u = F.conv(F.col("u8"), 16, 10).cast("long") / F.lit(4294967296.0)
    w = (
        F.when(u < POISSON_CDF[0], 0)
        .when(u < POISSON_CDF[1], 1)
        .when(u < POISSON_CDF[2], 2)
        .when(u < POISSON_CDF[3], 3)
        .when(u < POISSON_CDF[4], 4)
        .otherwise(5)
        .cast("long")
    )
    res = (
        base.select("event_type", "b", w.alias("w"), "c")
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("wc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type", (F.col("wc") / F.col("sw")).alias("mean_b")
        )
    )
    full = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).alias("sc"),
    )
    env = res.groupBy("event_type").agg(
        F.expr("percentile(mean_b, 0.025D)").alias("lo"),
        F.expr("percentile(mean_b, 0.975D)").alias("hi"),
    )
    return (
        full.join(env, "event_type")
        .select(
            "event_type",
            "n_events",
            TX_round((F.col("sc") / F.col("n_events")) / 100.0, 4).alias(
                "mean_value"
            ),
            TX_round(F.col("lo") / 100.0, 4).alias("ci_lo"),
            TX_round(F.col("hi") / 100.0, 4).alias("ci_hi"),
        )
    )


#: integer micro-units for per-term entropy quantization (the pagerank/
#: CUSUM discipline: quantize each -p·ln(p) term BEFORE the sum so both
#: engines add exact integers).
ENTROPY_UNIT = 1_000_000


def session_transition_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy of each event type's NEXT-event distribution —
    the branching-predictability readout over markov_transitions' exact
    pair counts: H(from) = -Σ p·ln(p), plus the branch count and
    normalized entropy H/ln(branches) (1.0 = uniformly unpredictable,
    0.0 = deterministic flow). On a curation pipeline the same shape
    scores page-category and tool-call transition predictability.

    CROSS-ENGINE DETERMINISM: each -p·ln(p) term is a fixed-shape IEEE
    expression over exact counts, floored to ENTROPY_UNIT micro-units
    BEFORE the per-type integer sum (order-independent); normalization
    is one IEEE division afterwards, NULL when branches == 1.

    100 TB shape: per-user windows bound the pair extraction (the
    markov shape), then a |types|²-bounded agg — nothing downstream
    touches raw events."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    return entropy_from_pairs(pairs)


def entropy_from_pairs(pairs: DataFrame) -> DataFrame:
    """The shared (from_type, to_type, n) → per-from entropy projection —
    consumed by session_transition_entropy and its streaming IVM twin,
    so the snapshot the twin emits is BY CONSTRUCTION the same math."""
    wt = Window.partitionBy("from_type")
    p = F.col("n") / F.sum("n").over(wt)
    term_u = F.floor(-p * F.log(p) * ENTROPY_UNIT).cast("long")
    per_from = pairs.select("from_type", term_u.alias("term_u")).groupBy(
        "from_type"
    ).agg(
        F.count("*").cast("long").alias("n_branches"),
        F.sum("term_u").alias("h_u"),
    )
    h = F.col("h_u") / F.lit(float(ENTROPY_UNIT))
    return per_from.select(
        "from_type",
        "n_branches",
        TX_round(h, 6).alias("entropy"),
        F.when(
            F.col("n_branches") > 1,
            TX_round(h / F.log(F.col("n_branches").cast("double")), 6),
        ).alias("norm_entropy"),
    )


#: ACF lags probed by autocorrelation_report (hours).
ACF_MAX_LAG = 6


def autocorrelation_report(
    spark: SparkSession, sf_dir: str, max_lag: int = ACF_MAX_LAG
) -> DataFrame:
    """Autocorrelation function of each event type's hourly-count series
    at lags 1..max_lag — the direct detector of periodicity and rate
    memory (a daily cycle spikes r_24; a crawler with retry storms shows
    slow decay), feeding seasonality_profile's calendar view with a
    model-free counterpart. Lags are over CONSECUTIVE OBSERVED hours
    (lead over the per-type hour order; the gap_fill_locf spine is the
    densifying companion when true calendar lags are wanted).

    CROSS-ENGINE DETERMINISM: the per-type mean is an exact-integer
    s1/cnt division; every (x_t-μ)(x_{t+k}-μ) product and (x_t-μ)² term
    is a fixed-shape IEEE expression floored to ENTROPY_UNIT micro-units
    before its integer sum, so r_k is a ratio of two exact unit-sums.

    100 TB shape: one (type, hour) partial agg bounds the series; the
    max_lag leads ride ONE per-type ordered window pass; the stack
    explodes to |series|×max_lag rows of two doubles — nothing touches
    raw events after the first agg."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    return acf_from_hourly(hourly, max_lag)


def acf_from_hourly(
    hourly: DataFrame, max_lag: int = ACF_MAX_LAG
) -> DataFrame:
    """ACF projection over a prepared (event_type, hour_ts, n) series —
    shared by autocorrelation_report and its streaming twin
    (streaming.pipeline.streaming_autocorrelation), so the snapshot a
    stream emits is BY CONSTRUCTION the batch operator's math over the
    incrementally-maintained counts."""
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    leads = hourly.select(
        "event_type",
        "n",
        *[
            F.lead("n", i).over(w).alias(f"lead_{i}")
            for i in range(1, max_lag + 1)
        ],
    )
    mu = hourly.groupBy("event_type").agg(
        (F.sum("n") / F.count("*")).alias("mu"),
    )
    stacked = (
        leads.join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            "mu",
            F.col("n").alias("x"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("int").alias("lag"),
                            F.col(f"lead_{i}").alias("y"),
                        )
                        for i in range(1, max_lag + 1)
                    ]
                )
            ).alias("p"),
        )
        .select("event_type", "mu", "x", F.col("p.lag").alias("lag"),
                F.col("p.y").alias("y"))
        .filter(F.col("y").isNotNull())
    )
    num_u = F.floor(
        (F.col("x") - F.col("mu")) * (F.col("y") - F.col("mu"))
        * ENTROPY_UNIT
    ).cast("long")
    den = hourly.join(F.broadcast(mu), "event_type").select(
        "event_type",
        F.floor(
            (F.col("n") - F.col("mu")) * (F.col("n") - F.col("mu"))
            * ENTROPY_UNIT
        ).cast("long").alias("d_u"),
    ).groupBy("event_type").agg(F.sum("d_u").alias("den_u"))
    return (
        stacked.groupBy("event_type", "lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(num_u).alias("num_u"),
        )
        .join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "lag",
            "n_pairs",
            TX_round(F.col("num_u") / F.col("den_u"), 6).alias("acf"),
        )
    )


def mann_whitney_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the value distributions of
    the two experiment arms (same arms as ab_test_report) — the
    NON-parametric companion: no normality assumption, robust to the
    heavy tails that break Welch on revenue-like metrics. Average ranks
    with the standard tie correction; one row: per-arm n, U for arm A,
    its null mean, and the tie-corrected z-score (Mann & Whitney 1947;
    normal approximation per Lehmann).

    CROSS-ENGINE DETERMINISM: ranks are computed per DISTINCT cents
    value from exact cumulative counts and carried in DOUBLED units
    (rank_x2 = 2*cum_before + cnt + 1 — an exact integer even for .5
    average ranks), so the rank sum is an exact-integer SUM; the tie
    term sums n³-n in decimal(38,0) (the HUGEINT discipline of
    graph_assortativity); z is one fixed-shape IEEE chain at the end.

    100 TB shape: one groupBy(cents) partial agg bounds everything at
    |distinct values| rows; one ordered window over that bounded frame;
    no per-row second pass."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_v = (
        ev.select("event_type", cents.alias("v"))
        .groupBy("v")
        .agg(
            F.sum((F.col("event_type") == AB_ARM_A).cast("long")).alias("na"),
            F.sum((F.col("event_type") == AB_ARM_B).cast("long")).alias("nb"),
        )
        .withColumn("nv", F.col("na") + F.col("nb"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "cum_before", F.coalesce(F.sum("nv").over(w), F.lit(0))
    ).withColumn("rank_x2", 2 * F.col("cum_before") + F.col("nv") + 1)
    agg = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") * F.col("rank_x2")).alias("r_a_x2"),
        F.sum(
            F.col("nv").cast("decimal(38,0)")
            * F.col("nv").cast("decimal(38,0)")
            * F.col("nv").cast("decimal(38,0)")
            - F.col("nv").cast("decimal(38,0)")
        ).alias("tie_term"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u_a = (F.col("r_a_x2") - n_a * (n_a + 1)) / F.lit(2.0)
    mean_u = n_a * n_b / F.lit(2.0)
    var_u = (
        n_a.cast("double") * n_b.cast("double") / 12.0
    ) * (
        (n + 1).cast("double")
        - F.col("tie_term").cast("double")
        / (n.cast("double") * (n - 1).cast("double"))
    )
    return agg.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        TX_round(u_a, 1).alias("u_stat"),
        TX_round(mean_u, 1).alias("mean_u"),
        TX_round((u_a - mean_u) / F.sqrt(var_u), 4).alias("z_score"),
    )


#: truncated-series depth for the asymptotic KS p-value — both engines
#: evaluate the IDENTICAL five-term alternating sum (j=1..5; terms decay
#: as exp(-2 j² λ²), so five terms are exact to double precision for
#: every λ the test statistic can produce on real data).
KS_SERIES_TERMS = 5


def ks_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the same two arms'
    value distributions: D = max over values of |F_a - F_b| computed
    EXACTLY (the ECDF gap at each distinct cents value is the integer
    cum_a*n_b - cum_b*n_a over the common denominator n_a*n_b), the
    value attaining it (ties -> smallest value), and the asymptotic
    p-value (Smirnov's Q_KS with the Stephens 1970 small-sample λ
    adjustment, the form Numerical Recipes standardizes).

    CROSS-ENGINE DETERMINISM: the argmax/max run over exact integers;
    only λ and the KS series are IEEE, evaluated as one identical
    fixed-shape five-term expression on both engines.

    100 TB shape: like mann_whitney_report — one groupBy(cents) agg,
    one window over the |distinct values|-bounded frame, a 1-row
    reduce."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_v = (
        ev.select("event_type", cents.alias("v"))
        .groupBy("v")
        .agg(
            F.sum((F.col("event_type") == AB_ARM_A).cast("long")).alias("da"),
            F.sum((F.col("event_type") == AB_ARM_B).cast("long")).alias("db"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("da").over(w).alias("cum_a"),
        F.sum("db").over(w).alias("cum_b"),
    )
    tot = per_v.agg(
        F.sum("da").alias("n_a"), F.sum("db").alias("n_b")
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap_num"),
    )
    top = gaps.orderBy(F.desc("gap_num"), "v").limit(1)
    d = F.col("gap_num") / (F.col("n_a").cast("double") * F.col("n_b"))
    en = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    lam = (en + 0.12 + 0.11 / en) * d
    # Q_KS(λ) = 2 Σ_{j>=1} (-1)^{j-1} exp(-2 j² λ²), truncated — the
    # SAME literal five-term chain is emitted in the oracle SQL
    q = 2.0 * sum(
        (1.0 if j % 2 == 1 else -1.0)
        * F.exp(-2.0 * float(j * j) * lam * lam)
        for j in range(1, KS_SERIES_TERMS + 1)
    )
    p = F.least(F.greatest(q, F.lit(0.0)), F.lit(1.0))
    return top.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        TX_round(d, 6).alias("d_stat"),
        TX_round(F.col("v") / 100.0, 2).alias("d_at_value"),
        TX_round(p, 6).alias("p_value"),
    )


#: seasonal-naive backtest lag: 24 hours (daily seasonality) — short
#: enough that every SF's event span scores a window.
SEASONAL_LAG_HOURS = 24


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the two zero-parameter forecasters every anomaly
    alarm implies — naive (next hour = this hour) vs seasonal-naive
    (next hour = same hour yesterday, Hyndman & Athanasopoulos ch. 5) —
    over each event type's dense hourly count series. Per type: scored
    hours, both MAEs (exact integer error sums), and the relative
    improvement of seasonal over naive. The sanity gate for
    seasonality_profile: if seasonal-naive does NOT beat naive, the
    claimed daily cycle isn't there, and a CUSUM tuned to it will page
    on noise.

    CROSS-ENGINE DETERMINISM: counts, gaps (zero-filled), absolute
    errors, and their sums are all exact integers; the two divisions
    and the improvement ratio are final-step IEEE ops.

    100 TB shape: one (type, hour) partial-agg count, a |types|x|hours|
    calendar-bounded dense grid (generated, not shuffled), two lag
    windows over the bounded grid, one |types|-row rollup."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").cast("long").alias("n"))
    span = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    scored = (
        dense.withColumn("f_naive", F.lag("n", 1).over(w))
        .withColumn("f_seasonal", F.lag("n", SEASONAL_LAG_HOURS).over(w))
        .filter(F.col("f_seasonal").isNotNull())
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_hours_scored"),
            F.sum(F.abs(F.col("n") - F.col("f_naive")))
            .cast("long")
            .alias("naive_abs_err"),
            F.sum(F.abs(F.col("n") - F.col("f_seasonal")))
            .cast("long")
            .alias("seasonal_abs_err"),
        )
        .select(
            "event_type",
            "n_hours_scored",
            TX_round(
                F.col("naive_abs_err") / F.col("n_hours_scored"), 6
            ).alias("naive_mae"),
            TX_round(
                F.col("seasonal_abs_err") / F.col("n_hours_scored"), 6
            ).alias("seasonal_mae"),
            F.when(
                F.col("naive_abs_err") > 0,
                TX_round(
                    1.0
                    - F.col("seasonal_abs_err") / F.col("naive_abs_err"),
                    6,
                ),
            ).alias("improvement"),
        )
        .orderBy("event_type")
    )


#: robust-residual threshold: |residual - median| > 3 * 1.4826 * MAD
SEASONAL_RESID_K = 3.0
MAD_SCALE = 1.4826


def seasonal_residual_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count anomalies AFTER removing the (day-of-week, hour-of-day)
    seasonal profile — the alarm seasonal_naive_backtest tells you to
    build: raw-count MAD alarms (value_anomalies' shape) page on every
    rush hour; this one subtracts each type's seasonal cell mean over
    the dense hourly grid and flags hours whose residual leaves the
    robust band |r - median(r)| > K * 1.4826 * MAD(r) (Hampel's rule).

    CROSS-ENGINE DETERMINISM: cell means are exact-integer sums over
    exact cell counts (one IEEE division); residuals are single
    subtractions; both medians select by row_number (even count -> mean
    of the middle two — the theil_sen selection rule); the band compare
    is one fixed-shape expression.

    100 TB shape: one (type, hour) count agg; the dense grid is
    calendar-bounded (generated, not shuffled); the profile is a
    |types|x168-cell agg; medians are windows over the bounded
    |types|x|hours| residual frame, partitioned by type."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").cast("long").alias("n"))
    span = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.dayofweek("h").alias("dow"),
        F.hour("h").alias("hod"),
    )
    prof = dense.groupBy("event_type", "dow", "hod").agg(
        F.sum("n").cast("long").alias("cell_sum"),
        F.count("*").cast("long").alias("cell_n"),
    )
    resid = (
        dense.join(prof, ["event_type", "dow", "hod"])
        .select(
            "event_type",
            "h",
            "n",
            (F.col("cell_sum") / F.col("cell_n")).alias("expected"),
            (F.col("n") - F.col("cell_sum") / F.col("cell_n")).alias("r"),
        )
    )
    w_r = Window.partitionBy("event_type").orderBy("r")
    ranked = resid.withColumn("rn", F.row_number().over(w_r))
    cnt = resid.groupBy("event_type").agg(
        F.count("*").cast("long").alias("m")
    )
    med = (
        ranked.join(F.broadcast(cnt), "event_type")
        .filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("m") / 2) + 1)
        )
        .groupBy("event_type")
        .agg((F.sum("r") / F.count("*")).alias("r_med"))
    )
    dev = resid.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("r") - F.col("r_med"))
    )
    w_a = Window.partitionBy("event_type").orderBy("ad")
    aranked = dev.withColumn("arn", F.row_number().over(w_a))
    mad = (
        aranked.join(F.broadcast(cnt), "event_type")
        .filter(
            (F.col("arn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("arn") == F.floor(F.col("m") / 2) + 1)
        )
        .groupBy("event_type")
        .agg((F.sum("ad") / F.count("*")).alias("mad"))
    )
    from jira_cdc_git_spark.functions.text import round_half_up

    return (
        dev.join(F.broadcast(mad), "event_type")
        # mad > 0 gates the FILTER, not just the z projection: a type
        # whose MAD degenerates to 0 (>50% identical residuals) would
        # otherwise alarm on every hour with ANY nonzero deviation —
        # degenerate types emit no flags instead of flooding (r9 advice)
        .filter(
            (F.col("mad") > 0)
            & (F.col("ad") > SEASONAL_RESID_K * MAD_SCALE * F.col("mad"))
        )
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            "n",
            round_half_up(F.col("expected"), 4).alias("expected"),
            round_half_up(F.col("r"), 4).alias("residual"),
            # always finite now that the filter requires mad > 0
            round_half_up(
                F.col("ad") / (F.lit(MAD_SCALE) * F.col("mad")), 4
            ).alias("robust_z"),
        )
        .orderBy("event_type", "hour_ts")
    )


def event_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over user event baskets: for
    every event-type pair, the users-with-both support count, both
    directional confidences, and the lift (how much more often the
    types co-occur per user than independence predicts) — the
    behavioral-coupling census (Agrawal & Srikant 1994's A-priori
    output shape at the pair level) that a funnel designer reads
    before ordering steps.

    CROSS-ENGINE DETERMINISM: all counts are exact integers over the
    distinct (user, type) projection; confidence and lift are single
    IEEE divisions of integers, micro-rounded.

    100 TB shape: one distinct (user, type) projection, one user-keyed
    self-join whose per-user fanout is bounded by |event_types|² (the
    basket width, never the event count), one |types|²-group agg, and
    a broadcast of the |types|-row support table."""
    from jira_cdc_git_spark.functions.text import round_half_up

    ev = load_table(spark, "events", sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    return rules_from_baskets(ut)


def rules_from_baskets(ut: DataFrame) -> DataFrame:
    """Association-rule projection from a DISTINCT (user_id, event_type)
    basket frame — shared by the batch operator and
    streaming_association_rules so the streaming twin's snapshot agrees
    with the batch report by construction (set union is abelian, so the
    distinct basket table folds incrementally)."""
    from jira_cdc_git_spark.functions.text import round_half_up

    supp = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users")
    )
    n_tot = ut.select("user_id").distinct().agg(
        F.count("*").cast("long").alias("n_total_users")
    )
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    out = (
        pairs.join(
            F.broadcast(
                supp.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_users").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                supp.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_users").alias("n_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n_tot))
    )
    return out.select(
        "type_a",
        "type_b",
        "n_both",
        "n_a",
        "n_b",
        "n_total_users",
        round_half_up(F.col("n_both") / F.col("n_a"), 6).alias(
            "confidence_a_to_b"
        ),
        round_half_up(F.col("n_both") / F.col("n_b"), 6).alias(
            "confidence_b_to_a"
        ),
        round_half_up(
            F.col("n_both") * F.col("n_total_users")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    ).orderBy("type_a", "type_b")


def inter_event_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival-gap distribution: for each event type, the
    p50/p90/p99 (R-7 linear interpolation — Spark percentile() and
    DuckDB quantile_cont share the definition, the doc_length_quantiles
    precedent) of the gap in seconds between a user's consecutive
    events of that type, plus gap count and max. The cadence profile
    that sizes session timeouts, dedup windows, and watermark delays —
    sessionize PICKS a 30-minute gap; this operator is how you justify
    it from the data.

    100 TB shape: one (user, type) repartition for the lag window
    (keyed, parallel — never a global sort), then a |types|-group
    percentile agg over the gap projection."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
            ).cast("long").alias("gap_s"),
        )
    )
    stats = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.expr("percentile(gap_s, array(0.5D, 0.9D, 0.99D))").alias("q"),
        F.max("gap_s").alias("max_gap_s"),
    )
    from jira_cdc_git_spark.functions.text import round_half_up

    return stats.select(
        "event_type",
        "n_gaps",
        round_half_up(F.element_at("q", 1), 2).alias("p50_gap_s"),
        round_half_up(F.element_at("q", 2), 2).alias("p90_gap_s"),
        round_half_up(F.element_at("q", 3), 2).alias("p99_gap_s"),
        "max_gap_s",
    ).orderBy("event_type")
