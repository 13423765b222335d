"""Event-stream analytics operators (the batch half of the events
surface next to streaming.py's windowed counts and sessionization):

* :func:`funnel` — strictly-ordered multi-step conversion funnel
  (view -> click -> purchase): step k counts users whose earliest
  step-k event happens AFTER their earliest qualifying step-(k-1)
  event;
* :func:`retention_cohorts` — day-grain cohort retention triangle:
  users cohorted by first-activity day, counted per (cohort day,
  day offset) of later activity.

Both are pure DataFrame programs whose shuffles key on user_id /
(cohort, offset) — never on event payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel(events: DataFrame, steps: list,
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Ordered conversion funnel: a user reaches step k iff they have
    a ``steps[k]`` event strictly after their earliest arrival at
    step k-1 (the standard strict-sequence funnel, not mere set
    membership).

    Scale shape: one user-keyed groupBy per step over only that
    step's events (the type filter pushes into the scan), each
    joined user-to-user against the previous frontier — k small
    equi-joins, no window, no ordering of the raw stream.  Frontier
    frames are user-dimension-sized (one row per surviving user).

    Returns (step, step_name, n_users) with step 1-based."""
    spark = events.sparkSession
    out = []
    frontier = None
    for i, name in enumerate(steps, 1):
        ev = (events.where(F.col(type_col) == name)
              .select(F.col(user_col).alias("u"),
                      F.col(ts_col).alias("t")))
        if frontier is None:
            frontier = ev.groupBy("u").agg(F.min("t").alias("t"))
        else:
            prev = frontier.select("u", F.col("t").alias("pt"))
            frontier = (ev.join(prev, "u")
                        .where(F.col("t") > F.col("pt"))
                        .groupBy("u").agg(F.min("t").alias("t")))
        # lineage cut per step (iterative-op convention): without it
        # step k's count() re-executes steps 1..k-1's joins — O(k^2)
        # scans of the event table
        frontier = frontier.localCheckpoint()
        out.append((i, name, frontier.count()))
    return spark.createDataFrame(
        out, "step int, step_name string, n_users long")


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Day-grain retention triangle: cohort = the user's first active
    day; one output row per (cohort_day, day_offset) counting the
    cohort's users active that day (offset 0 row = cohort size).

    Scale shape: first-day per user is one groupBy; activity days
    dedupe map-side into (user, day) rows; the cohort join keys on
    the user; the final count groups by (cohort, offset) — all hash
    aggregations, no window.

    Returns (cohort_day, day_offset, n_users)."""
    day = F.to_date(F.col(ts_col))
    first = (events.select(F.col(user_col).alias("u"), day.alias("d"))
             .groupBy("u").agg(F.min("d").alias("cohort_day")))
    active = (events.select(F.col(user_col).alias("u"), day.alias("d"))
              .distinct())
    return (active.join(first, "u")
            # cohort day as ISO string: pandas widens bare dates to
            # midnight timestamps inconsistently across engines
            .select(F.col("cohort_day").cast("string").alias("cohort_day"),
                    F.datediff(F.col("d"), F.col("cohort_day"))
                    .alias("day_offset"))
            .groupBy("cohort_day", "day_offset")
            # (user, day) rows are distinct, so count(*) = user count
            .agg(F.count("*").alias("n_users")))


def daily_anomalies(events: DataFrame, ts_col: str = "ts",
                    z_threshold: float = 2.0) -> DataFrame:
    """Daily event-volume anomaly detection: z-score each day's count
    against the corpus mean/population-std of daily counts, flag
    |z| > threshold (the ops-monitoring staple over an event table).

    Scale shape: one day-keyed groupBy (map-side partials collapse
    the stream), then a 1-row broadcast stats aggregate computed from
    EXACT integer sums (count, sum, sum of squares) so both engines
    derive the identical doubles; z rounded to 6.

    Returns (day, n_events, z, is_anomaly)."""
    daily = (events.select(F.to_date(F.col(ts_col)).alias("day"))
             .groupBy("day").agg(F.count("*").alias("n_events")))
    stats = daily.agg(
        F.count("*").alias("d"),
        F.sum("n_events").alias("sn"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sn2"))
    mean = F.col("sn") / F.col("d")
    var = F.col("sn2") / F.col("d") - mean * mean
    z = F.round((F.col("n_events") - mean) / F.sqrt(var), 6)
    return (daily.crossJoin(F.broadcast(stats))
            .select(F.col("day").cast("string").alias("day"),
                    "n_events", z.alias("z"),
                    (F.abs(z) > z_threshold).alias("is_anomaly")))


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      order_cols: tuple = ("ts", "event_id")) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    ordered pair of event types, how often type B immediately follows
    type A within one user's stream, and the row-normalized transition
    probability -- the session-model behind next-action prediction and
    journey anomaly detection.

    Per-user ordering is (ts, event_id) -- a total order, so lead() is
    deterministic under timestamp ties.  ``p = n / n_from`` is one IEEE
    division of two longs.

    Scale shape: ONE window per user partition (users are independent;
    a mega-user is inherent data skew, not plan skew), then a groupBy
    on the (type, type) dimension -- map-side partials do the heavy
    lifting.  Returns (from_type, to_type, n, n_from, p).
    """
    from pyspark.sql import Window
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (events.select(F.col(type_col).alias("from_type"),
                           F.lead(type_col).over(w).alias("to_type"))
             .where(F.col("to_type").isNotNull()))
    cnt = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from"))
    return (cnt.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type", "n", "n_from",
                    (F.col("n").cast("double") / F.col("n_from"))
                    .alias("p")))


def bot_signals(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts", min_events: int = 5) -> DataFrame:
    """Bot / automation timing signals per user: humans produce
    irregular inter-event gaps, schedulers produce metronomes.  Per
    user with at least ``min_events`` events:

    * ``n_gaps``, ``mean_gap_us`` (one division),
    * ``cv2`` -- the squared coefficient of variation of the gaps,
      computed as ``(n * sum(g^2) - sum(g)^2) / sum(g)^2`` where both
      sums are DECIMAL(38,0) over microsecond longs (gap-squared
      overflows int64; decimal keeps the replay exact) -- cv2 near 0
      means clockwork timing,
    * ``n_distinct_gaps`` -- a metronome has one.

    Scale shape: one lag window per user partition, one groupBy per
    user -- users are independent, the window never crosses them.
    """
    from pyspark.sql import Window
    # parquet event times are TIMESTAMP_NTZ; the session runs UTC, so
    # the cast is the identity on wall time and epoch microseconds
    # line up with a naive-timestamp replay
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us, "event_id")
    g = us - F.lag(us).over(w)
    base = (events.select(F.col(user_col).alias("user_id"),
                          g.alias("g"))
            .where(F.col("g").isNotNull()))
    dec = F.col("g").cast("decimal(38,0)")
    agg = (base.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                F.sum(dec).alias("s1"),
                F.sum(dec * dec).alias("s2"),
                F.countDistinct("g").cast("long").alias("n_distinct_gaps")))
    agg = agg.where(F.col("n_gaps") >= int(min_events) - 1)
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("n_gaps")
    return agg.select(
        "user_id", "n_gaps",
        (s1.cast("double") / n).alias("mean_gap_us"),
        F.when(s1 > 0,
               (n * s2 - s1 * s1).cast("double")
               / (s1 * s1).cast("double")).alias("cv2"),
        "n_distinct_gaps")


def cusum_alarms(events: DataFrame, ts_col: str = "ts",
                 type_col: str = "event_type",
                 slack_mult: float = 0.5, h_mult: float = 4.0,
                 round_to: int = 6) -> DataFrame:
    """Per-event-type one-sided CUSUM change-point detection (Page
    1954) over the daily count series: S+_t = max(0, S+_{t-1} +
    (x_t - mu - k)) flags upward level shifts, S-_t symmetrically
    downward, alarm when the statistic exceeds h = h_mult * sigma;
    slack k = slack_mult * sigma, mu/sigma = per-type mean and
    population stddev of the daily counts.

    The recursion is NOT evaluated row-at-a-time: max(0, S+prev+d) has
    the closed prefix form S+_t = P_t - min(0, min_{j<=t} P_j) with
    P_t = cumsum(d_t), so both sides are two cumulative windows
    (running sum + running extremum) partitioned by event_type —
    fully parallel across types, one shuffle, no iteration.  Day
    counts per type are bounded (years of days), so the per-type
    window never concentrates unbounded rows.

    Returns (event_type, day, n, cusum_pos, cusum_neg, alarm_up,
    alarm_down)."""
    daily = (events.groupBy(F.col(type_col).alias("event_type"),
                            F.to_date(ts_col).alias("day"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    # mu/sigma from EXACT integer sums (not stddev_pop, whose Welford
    # accumulation order differs per engine): var = (c*s2 - s1^2)/c^2
    # is one double expression over exact longs -> bit-reproducible
    stats = (daily.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("c"),
                  F.sum("n").alias("s1"),
                  F.sum(F.col("n") * F.col("n")).alias("s2"))
             .select("event_type",
                     (F.col("s1").cast("double") / F.col("c"))
                     .alias("mu"),
                     F.sqrt(F.greatest(F.lit(0.0),
                            (F.col("c") * F.col("s2")
                             - F.col("s1") * F.col("s1")).cast("double")
                            / (F.col("c") * F.col("c")).cast("double")))
                     .alias("sigma")))
    d = (daily.join(F.broadcast(stats), "event_type")
         .withColumn("h", F.col("sigma") * F.lit(float(h_mult))))
    k = F.col("sigma") * F.lit(float(slack_mult))
    dev_p = F.col("n") - F.col("mu") - k   # drives S+
    dev_n = F.col("n") - F.col("mu") + k   # drives S-
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    # stage 1: prefix sums; stage 2: running extrema of those sums
    # (window-over-window must be two projections)
    staged = d.select(
        "event_type", "day", "n", "h",
        F.sum(dev_p).over(w).alias("p_pos"),
        F.sum(dev_n).over(w).alias("p_neg"))
    s_pos = (F.col("p_pos")
             - F.least(F.lit(0.0), F.min("p_pos").over(w)))
    # subtraction form (running max includes the current row, so the
    # result is >= 0 exactly) -- avoids IEEE -0.0 from unary negation
    s_neg = (F.greatest(F.lit(0.0), F.max("p_neg").over(w))
             - F.col("p_neg"))
    h = F.col("h")
    return staged.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(s_pos, round_to).alias("cusum_pos"),
        F.round(s_neg, round_to).alias("cusum_neg"),
        (s_pos > h).alias("alarm_up"),
        (s_neg > h).alias("alarm_down"))


def _daily_counts(events: DataFrame, ts_col: str,
                  type_col: str) -> DataFrame:
    return (events.groupBy(F.col(type_col).alias("event_type"),
                           F.to_date(ts_col).alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def acf_daily(events: DataFrame, ts_col: str = "ts",
              type_col: str = "event_type", max_lag: int = 7,
              round_to: int = 6) -> DataFrame:
    """Lag-k autocorrelation of the per-type daily count series for
    k = 1..max_lag, as the Pearson correlation over the (x_t, x_{t+k})
    overlap pairs (the 'lagged Pearson' ACF variant — declared, since
    the global-mean variant mixes overlap and margin terms).  Rhythm
    detector: r_7 >> r_1 flags weekly seasonality, negative r_1 flags
    alternation — the input signal for recrawl scheduling.

    Scale shape: daily counts = one groupBy (map-side combined); each
    lag is a CALENDAR-day equi-join of the per-type day series with
    itself (day + k = day', so missing days pair with nothing — the
    row-offset lag() variant silently skips gaps), each join on a
    dimension-sized frame (years of days per type, never
    corpus-sized); the correlation is a closed-form aggregate over
    EXACT integer moment sums — one double expression at the end,
    bit-stable across engines.

    Returns (event_type, lag, n_pairs, r)."""
    daily = _daily_counts(events, ts_col, type_col)
    outs = []
    for k in range(1, max_lag + 1):
        head = daily.select("event_type",
                            F.date_add("day", k).alias("jday"),
                            F.col("n").alias("x"))
        tail = daily.select("event_type", F.col("day").alias("jday"),
                            F.col("n").alias("y"))
        pairs = head.join(tail, ["event_type", "jday"])
        x, y = F.col("x"), F.col("y")
        agg = (pairs.groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                    F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                    F.sum(x * y).alias("sxy"),
                    F.sum(x * x).alias("sxx"),
                    F.sum(y * y).alias("syy")))
        c = F.col("n_pairs")
        num = (c * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        den = F.sqrt((c * F.col("sxx") - F.col("sx") * F.col("sx"))
                     .cast("double")
                     * (c * F.col("syy") - F.col("sy") * F.col("sy"))
                     .cast("double"))
        outs.append(agg.select(
            "event_type", F.lit(k).cast("int").alias("lag"), "n_pairs",
            F.when(den > 0, F.round(num / den, round_to))
            .alias("r")))  # NULL r for zero-variance (constant) series
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def theil_sen_trend(events: DataFrame, ts_col: str = "ts",
                    type_col: str = "event_type") -> DataFrame:
    """Theil-Sen robust trend of the per-type daily count series:
    slope = median over all day pairs i<j of (n_j - n_i)/(d_j - d_i),
    intercept = median(n) - slope * median(d) (Conover's form), with
    exact medians (mean of the two middle order statistics when the
    count is even).  Breakdown point 29% — one corrupted crawl day
    cannot fake a traffic trend the way it drags an OLS line.

    Scale shape: the O(d^2) pair join runs on the per-type DAILY
    aggregate (d = #days, so years of data is ~10^5 pairs per type,
    bounded and partition-local after one shuffle on event_type);
    medians are rank-picked with row_number windows over the same
    dimension-sized frames.  Raw IEEE slopes rank identically in any
    engine; outputs are floor-scaled micro integers (floor of a
    bit-identical double is deterministic — round(x, 6) at an exact
    .xxxxxx5 tie is NOT: Spark HALF_UPs where DuckDB's double round
    goes even, a divergence this query actually hit at sf0.01).

    Returns (event_type, n_days, n_pairs, sen_slope_micro,
    intercept_micro)."""
    daily = (_daily_counts(events, ts_col, type_col)
             .select("event_type",
                     F.datediff("day", F.lit("1970-01-01"))
                     .cast("long").alias("d"), "n"))
    a = daily.select("event_type", F.col("d").alias("d1"),
                     F.col("n").alias("n1"))
    b = daily.select("event_type", F.col("d").alias("d2"),
                     F.col("n").alias("n2"))
    pairs = (a.join(b, "event_type")
             .where(F.col("d2") > F.col("d1"))
             .select("event_type",
                     ((F.col("n2") - F.col("n1")).cast("double")
                      / (F.col("d2") - F.col("d1")).cast("double"))
                     .alias("slope")))

    def _median(df, part, val):
        w = Window.partitionBy(part).orderBy(val)
        cnt = Window.partitionBy(part)
        r = F.row_number().over(w)
        c = F.count(F.lit(1)).over(cnt)
        # the two middle order statistics: floor/ceil of (c+1)/2
        return (df.withColumn("_r", r).withColumn("_c", c)
                .where((F.col("_r") == F.floor((F.col("_c") + 1) / 2))
                       | (F.col("_r") == F.ceil((F.col("_c") + 1) / 2)))
                .groupBy(part)
                .agg(F.avg(val).alias("med"),
                     F.max("_c").cast("long").alias("cnt")))

    med_slope = (_median(pairs, "event_type", "slope")
                 .select("event_type", F.col("med").alias("sen_slope"),
                         F.col("cnt").alias("n_pairs")))
    med_d = (_median(daily.select("event_type",
                                  F.col("d").cast("double").alias("dv")),
                     "event_type", "dv")
             .select("event_type", F.col("med").alias("med_d"),
                     F.col("cnt").alias("n_days")))
    med_n = (_median(daily.select("event_type",
                                  F.col("n").cast("double").alias("nv")),
                     "event_type", "nv")
             .select("event_type", F.col("med").alias("med_n")))
    return (med_slope.join(med_d, "event_type").join(med_n, "event_type")
            .select("event_type", "n_days", "n_pairs",
                    F.floor(F.col("sen_slope") * 1000000)
                    .cast("long").alias("sen_slope_micro"),
                    F.floor((F.col("med_n")
                             - F.col("sen_slope") * F.col("med_d"))
                            * 1000000)
                    .cast("long").alias("intercept_micro")))


def time_to_event(events: DataFrame, target_type: str = "purchase",
                  followup_hours: int = 72, user_col: str = "user_id",
                  ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Per-user time-to-event subjects for survival analysis: hours
    from a user's FIRST event to their first ``target_type`` event,
    right-censored at a fixed ``followup_hours`` administrative
    cutoff (the standard fixed-follow-up design: a conversion later
    than the window -- or never -- is only known to exceed it).

    Scale shape: two user-keyed aggregates (one over the full stream,
    one over the type-filtered slice -- the filter pushes into the
    scan) and a user-dimension-sized join.  Timestamps are truncated
    to whole epoch seconds on BOTH engines before differencing.

    Returns (user_id, t, censored): t = whole hours to conversion,
    clamped to ``followup_hours`` for censored subjects."""
    first = (events.groupBy(F.col(user_col).alias("u"))
             .agg(F.min(ts_col).alias("f0")))
    conv = (events.where(F.col(type_col) == target_type)
            .groupBy(F.col(user_col).alias("u"))
            .agg(F.min(ts_col).alias("p0")))
    th = F.floor((F.unix_timestamp("p0") - F.unix_timestamp("f0"))
                 / 3600).cast("long")
    return (first.join(conv, "u", "left")
            .select(F.col("u").alias(user_col),
                    F.when(th.isNull() | (th > followup_hours),
                           F.lit(followup_hours).cast("long"))
                    .otherwise(th).alias("t"),
                    (th.isNull() | (th > followup_hours))
                    .alias("censored")))


def kaplan_meier(subjects: DataFrame, t_col: str = "t",
                 censored_col: str = "censored") -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) over (duration, censored) subject rows: censored subjects
    enter the at-risk sets but never count as deaths.

    Scale shape: one groupBy(t) over the subjects (the only
    subject-sized shuffle), then everything is distinct-duration-
    sized: at-risk counts are a suffix-cumulative window over per-t
    subject counts, and the product limit is the exp-sum-log
    cumulative window.  No per-subject resort, no driver state.

    Returns one row per death time: (t, n_risk, n_deaths, survival)
    with survival = prod_{t' <= t} (1 - d/n), exactly 0 when the
    at-risk set empties (flag-propagated, not ln(0))."""
    per_t = (subjects.groupBy(F.col(t_col).alias("t"))
             .agg(F.count("*").cast("long").alias("n_ending"),
                  F.sum(F.when(~F.col(censored_col), 1).otherwise(0))
                  .cast("long").alias("n_deaths")))
    w = Window.orderBy("t")
    at_risk = per_t.withColumn(
        "n_risk",
        (F.sum("n_ending").over(
            w.rowsBetween(Window.currentRow,
                          Window.unboundedFollowing))).cast("long"))
    deaths = at_risk.where(F.col("n_deaths") > 0)
    # the full-death step (d == n) would feed ln(0) -- contribute a
    # neutral 1.0 there and let the propagated zero flag zero the
    # output instead (identical guard in the DuckDB oracle)
    factor = F.when(F.col("n_deaths") == F.col("n_risk"), F.lit(1.0)) \
        .otherwise(F.lit(1.0) - F.col("n_deaths") / F.col("n_risk"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (deaths
           .withColumn("zero",
                       F.max(F.when(F.col("n_deaths") == F.col("n_risk"),
                                    1).otherwise(0)).over(cum))
           .withColumn(
               "survival",
               F.round(
                   F.when(F.col("zero") == 1, F.lit(0.0))
                   .otherwise(F.exp(F.sum(
                       F.log(factor)).over(cum))), 6)))
    return out.select("t", "n_risk", "n_deaths", "survival")


def event_sequences(events: DataFrame, user_col: str = "user_id",
                    type_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id", k: int = 3,
                    min_count: int = 2) -> DataFrame:
    """Frequent contiguous k-step event-type sequences (PrefixSpan's
    contiguous special case): per-user lead() windows slide a k-gram
    over the time-ordered stream, then one corpus-wide count.

    Scale shape: the per-user window is one shuffle keyed on user
    (bounded partitions — a user's stream, not the corpus), and the
    sequence space is |event_types|^k, so the final groupBy is
    dimension-sized.  No driver-side state, no self-joins.

    Returns (step_1 .. step_k, n_users, n_occurrences) for sequences
    seen at least ``min_count`` times.
    """
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col), F.col(id_col)))
    cols = [F.col(type_col).alias("step_1")]
    for i in range(1, k):
        cols.append(F.lead(type_col, i).over(w).alias("step_%d" % (i + 1)))
    grams = (events.select(F.col(user_col).alias("u"), *cols)
             .where(F.col("step_%d" % k).isNotNull()))
    return (grams.groupBy(*["step_%d" % (i + 1) for i in range(k)])
            .agg(F.countDistinct("u").cast("long").alias("n_users"),
                 F.count("*").cast("long").alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count))


def sliding_distinct(events: DataFrame, window_days: int = 7,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Trailing-window distinct actives per day (the "7-day active
    users" series): for every day present in the stream, the number
    of distinct users with >= 1 event in [day - window + 1, day].

    Distinct-over-sliding-windows can't be map-side combined the way
    sums can (distinct isn't subtractable), so the scalable shape is
    two-phase: (1) dedupe events to (user, day) pairs FIRST — at
    10^12 events over ~10^8 user-days this is the 10^4x reduction,
    and it's one exact hash aggregate; (2) each (user, day) pair
    votes for the ``window_days`` target days it can serve via a
    bounded explode (7x on the already-tiny deduped table), then one
    distinct-count per target day.  The explode replaces a range
    join (day BETWEEN d AND d+6) that Spark would execute as
    broadcast-nested-loop; at a fixed small window the linear
    explode always wins.  Trailing days with no events of their own
    are dropped (inner join with the observed-day spine), matching
    the "per day present in the stream" contract.

    Returns (day:string yyyy-MM-dd, n_active_1d, n_active_7d),
    all-integer counts.
    """
    ud = (events.select(F.col(user_col).alias("u"),
                        F.to_date(ts_col).alias("d"))
          .distinct())
    spine = ud.select("d").distinct()
    votes = (ud.select(
        "u", F.explode(F.sequence(
            F.col("d"),
            F.date_add(F.col("d"), window_days - 1))).alias("day"))
        .join(spine.withColumnRenamed("d", "day"), "day"))
    wide = (votes.groupBy("day")
            .agg(F.countDistinct("u").alias("n_active_7d")))
    daily = (ud.groupBy(F.col("d").alias("day"))
             .agg(F.countDistinct("u").alias("n_active_1d")))
    return (daily.join(wide, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.col("n_active_1d").cast("long"),
                    F.col("n_active_7d").cast("long")))


def decayed_counts(events: DataFrame, half_life_days: int = 7,
                   user_col: str = "user_id",
                   ts_col: str = "ts") -> DataFrame:
    """Per-user exponentially decayed activity score with an
    ALL-INTEGER decay kernel: recency-weighted engagement (the
    freshness prior in ranking / recrawl / user-model features)
    where an event ``a`` days old weighs
    ``1_000_000 >> (a div half_life)`` micro-units — exact halving
    per elapsed half-life, no floating pow, so any engine replaying
    the rule agrees bit-for-bit (libm pow is not correctly rounded
    and Java/C disagree on it; a shift is a shift everywhere).

    The reference day is the stream's max event date (deterministic
    for a fixed input, no wall clock).  Computing it is a 1-row
    aggregate broadcast back into the scan via a cross join — the
    standard scalar-subquery shape, metadata-sized.  The scoring
    itself is one map + one groupBy on the user key.

    Returns (user_id, n_events, decayed_micro, last_day) with
    last_day the user's most recent event date (yyyy-MM-dd).
    """
    d = events.select(F.col(user_col).alias("user_id"),
                      F.to_date(ts_col).alias("d"))
    ref = d.agg(F.max("d").alias("_ref"))
    hl = int(half_life_days)
    return (d.crossJoin(F.broadcast(ref))
            .withColumn("_sh", F.least(
                F.expr("datediff(_ref, d) div %d" % hl),
                F.lit(62).cast("long")).cast("int"))
            .select("user_id", "d",
                    F.expr("1000000L div shiftleft(1L, _sh)")
                    .cast("long").alias("w"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum("w").cast("long").alias("decayed_micro"),
                 F.date_format(F.max("d"), "yyyy-MM-dd")
                 .alias("last_day")))


def attribution(events: DataFrame, channels: list,
                conversion_type: str = "purchase",
                user_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type",
                id_col: str = "event_id") -> DataFrame:
    """Multi-touch attribution (first-touch / last-touch / linear)
    over per-user event streams: every channel touch is assigned to
    the user's NEXT conversion (touches after the final conversion
    stay unattributed and are excluded), then each model splits 1000
    permille of conversion credit across the journey's touches —
    first gives it all to the opener, last to the closer, linear
    splits evenly with the integer remainder pinned to the closer
    (declared convention, keeps every journey summing to exactly
    1000 in both engines).

    Scale shape: ONE user-keyed shuffle feeds all windows (next-
    conversion id is a reverse running count, first/last flags are
    min/max over (user, conversion) — Spark evaluates them in the
    same sort), then one channel-keyed aggregate over journey-sized
    groups.  All credit stays integer permille.

    Returns (channel, n_touches, n_conversions_touched,
    first_permille, last_permille, linear_permille)."""
    from pyspark.sql import Window
    u, t, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    ordered = Window.partitionBy(u).orderBy(t.asc(),
                                            F.col(id_col).asc())
    # conversions remaining at-or-after each row: the next-conversion
    # id counted from the stream's end (0 = after the last conversion)
    conv_after = F.sum(
        F.when(ty == conversion_type, 1).otherwise(0)).over(
        ordered.rowsBetween(0, Window.unboundedFollowing))
    touches = (events
               .withColumn("__conv", conv_after)
               .where(ty.isin(channels) & (F.col("__conv") > 0))
               .select(u.alias("user"), F.col("__conv").alias("conv"),
                       ty.alias("channel"), t.alias("t"),
                       F.col(id_col).alias("eid")))
    jw = Window.partitionBy("user", "conv")
    jord = jw.orderBy(F.col("t").asc(), F.col("eid").asc())
    marked = touches.select(
        "channel", "user", "conv",
        (F.row_number().over(jord) == 1).alias("is_first"),
        (F.row_number().over(
            jw.orderBy(F.col("t").desc(), F.col("eid").desc())) == 1)
        .alias("is_last"),
        F.count(F.lit(1)).over(jw).alias("n_j"))
    lin = (F.expr("1000 div n_j")
           + F.when(F.col("is_last"),
                    F.lit(1000) - F.expr("1000 div n_j")
                    * F.col("n_j")).otherwise(0))
    return (marked
            .groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
                 F.countDistinct("user", "conv").cast("long")
                 .alias("n_conversions_touched"),
                 F.sum(F.when(F.col("is_first"), 1000).otherwise(0))
                 .cast("long").alias("first_permille"),
                 F.sum(F.when(F.col("is_last"), 1000).otherwise(0))
                 .cast("long").alias("last_permille"),
                 F.sum(lin).cast("long").alias("linear_permille")))


def path_prefixes(events: DataFrame, max_depth: int = 3,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  id_col: str = "event_id") -> DataFrame:
    """Sankey/flow aggregation: the first ``max_depth`` events of
    every user's stream, rolled up as path PREFIXES at each depth —
    the (depth, path, n_users) table a flow diagram renders directly
    (each depth-d count is the parent of its depth-d+1 extensions).

    One user-keyed window takes the head of each stream (row_number
    <= max_depth), a per-user sort-array builds the full head path
    map-side, a bounded ``max_depth``-way explode emits the
    prefixes, and one path-keyed aggregate counts users.  Nothing is
    globally ordered; the explode fan-out is the constant
    ``max_depth``."""
    from pyspark.sql import Window
    u = F.col(user_col)
    ordered = Window.partitionBy(u).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    head = (events
            .withColumn("__rn", F.row_number().over(ordered))
            .where(F.col("__rn") <= max_depth)
            .groupBy(u.alias("user"))
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("__rn").alias("rn"),
                         F.col(type_col).alias("t")))).alias("seq")))
    pref = head.select(
        "user", F.explode(F.sequence(
            F.lit(1), F.least(F.lit(max_depth), F.size("seq"))))
        .alias("depth"), "seq")
    path = F.array_join(
        F.transform(F.slice("seq", 1, F.col("depth")),
                    lambda s: s["t"]), ">")
    return (pref.select("depth", path.alias("path"))
            .groupBy("depth", "path")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(F.col("depth").cast("int").alias("depth"),
                    "path", "n_users"))


def markov_attribution(events: DataFrame, channels: list,
                       conversion_type: str = "purchase",
                       iterations: int = 12,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       id_col: str = "event_id") -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    data-driven model that replaced positional heuristics): build the
    first-order channel transition matrix from observed journeys,
    compute the chain's conversion probability from START by value
    iteration over the absorbing CONV/NULL states, then re-compute it
    with each channel knocked out (its state's value forced to 0);
    the drop is the channel's removal effect, normalized to
    attribution shares.

    Split of labor at scale: the JOURNEY construction and transition
    COUNTING are the data-sized work — one user-keyed shuffle and one
    (from, to)-keyed aggregate, the same inventory as
    :func:`attribution`.  The resulting matrix is
    (channels+1) x (channels+2) — DIMENSION-sized — so the value
    iteration runs driver-side in exact Python integers over the
    collected matrix (the IVF-centroid precedent: driver math over a
    distributed aggregate), and the oracle replays the identical
    integer recursion.  Probabilities are permille (1000 * n div
    out_total); each iteration computes
    v(s) = (sum_to p_permille(s, to) * v(to)) div 1000 in micro
    units — one div AFTER the exact integer dot product.

    Returns one row per channel: (channel, base_conv_micro,
    removed_conv_micro, removal_effect_micro, attribution_permille)
    — shares split 1000 permille by integer div with the remainder
    on the LAST channel in lexicographic order (declared)."""
    from pyspark.sql import Window
    u, ty = F.col(user_col), F.col(type_col)
    ordered = Window.partitionBy(u).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    conv_after = F.sum(
        F.when(ty == conversion_type, 1).otherwise(0)).over(
        ordered.rowsBetween(0, Window.unboundedFollowing))
    touches = (events
               .withColumn("__conv", conv_after)
               .where(ty.isin(channels))
               .select(u.alias("user"), F.col("__conv").alias("conv"),
                       ty.alias("channel"), F.col(ts_col).alias("t"),
                       F.col(id_col).alias("eid")))
    jord = Window.partitionBy("user", "conv").orderBy(
        F.col("t").asc(), F.col("eid").asc())
    seq = touches.select(
        "channel", "conv",
        F.row_number().over(jord).alias("rn"),
        F.lead("channel").over(jord).alias("next"))
    trans = (seq.select(
        F.col("channel").alias("src"),
        F.coalesce("next",
                   F.when(F.col("conv") > 0, F.lit("CONV"))
                   .otherwise(F.lit("NULL"))).alias("dst"))
        .unionByName(seq.where(F.col("rn") == 1)
                     .select(F.lit("START").alias("src"),
                             F.col("channel").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))
    rows = trans.collect()                     # dimension-sized
    out_tot: dict = {}
    for r in rows:
        out_tot[r.src] = out_tot.get(r.src, 0) + r.n
    p = {(r.src, r.dst): r.n * 1000 // out_tot[r.src] for r in rows}
    states = ["START"] + sorted(channels)

    def conv_prob(knocked: str | None) -> int:
        v = {"CONV": 1000000, "NULL": 0}
        for s in states:
            v[s] = 0
        for _ in range(iterations):
            nv = dict(v)
            for s in states:
                if s == knocked:
                    nv[s] = 0
                    continue
                acc = 0
                for d in states[1:] + ["CONV", "NULL"]:
                    acc += p.get((s, d), 0) * v[d]
                nv[s] = acc // 1000
            v = nv
        return v["START"]

    base = conv_prob(None)
    effects = {c: base - conv_prob(c) for c in sorted(channels)}
    tot = sum(effects.values())
    shares, acc = {}, 0
    for i, c in enumerate(sorted(channels)):
        if tot <= 0:
            shares[c] = 0
        elif i < len(channels) - 1:
            shares[c] = effects[c] * 1000 // tot
            acc += shares[c]
        else:
            shares[c] = 1000 - acc             # remainder to the last
    spark = events.sparkSession
    return spark.createDataFrame(
        [(c, base, base - effects[c], effects[c], shares[c])
         for c in sorted(channels)],
        "channel string, base_conv_micro long, "
        "removed_conv_micro long, removal_effect_micro long, "
        "attribution_permille long")


def cohort_revenue(events: DataFrame,
                   revenue_type: str = "purchase",
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type",
                   value_col: str = "value") -> DataFrame:
    """Cohort LTV table: users grouped by their signup month (first
    event), revenue accumulated by cohort age — the
    (cohort, age) -> cumulative-revenue triangle every subscription/
    commerce dashboard renders.  Revenue is integer CENTS
    (round(value*100) — one IEEE multiply+round both engines share,
    declared), so every aggregate and the running total are exact
    longs.

    Shape: first-event month is one user-keyed min; attribution of
    each revenue event to (cohort, age) is a map-side month-diff
    after ONE user-keyed join; the triangle is one (cohort, age)
    aggregate plus a cohort-keyed running-sum window over the
    dimension-sized triangle itself.

    Returns (cohort_month, age_months, n_active_users,
    revenue_cents, cum_revenue_cents)."""
    from pyspark.sql import Window
    u = F.col(user_col)
    first = (events.groupBy(u.alias("user"))
             .agg(F.date_format(F.min(ts_col), "yyyy-MM")
                  .alias("cohort_month"),
                  F.min(F.date_trunc("month", F.col(ts_col)))
                  .alias("m0")))
    rev = (events.where(F.col(type_col) == revenue_type)
           .select(u.alias("user"), F.col(ts_col).alias("t"),
                   F.round(F.col(value_col) * 100).cast("long")
                   .alias("cents")))
    joined = rev.join(first, "user").select(
        "user", "cohort_month", "cents",
        (F.months_between(F.date_trunc("month", F.col("t")),
                          F.col("m0"))).cast("long")
        .alias("age_months"))
    tri = (joined.groupBy("cohort_month", "age_months")
           .agg(F.countDistinct("user").cast("long")
                .alias("n_active_users"),
                F.sum("cents").cast("long").alias("revenue_cents")))
    w = (Window.partitionBy("cohort_month").orderBy("age_months")
         .rowsBetween(Window.unboundedPreceding, 0))
    return tri.select(
        "cohort_month", "age_months", "n_active_users",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long")
        .alias("cum_revenue_cents"))


def sprt(observations: DataFrame, p0: float, p1: float,
         alpha: float = 0.05, beta: float = 0.05,
         group_col: str = "grp", success_col: str = "success",
         order_cols: tuple = ("ts", "event_id")) -> DataFrame:
    """Wald's sequential probability ratio test per experiment
    group: walk the observation stream in time order accumulating
    the Bernoulli log-likelihood ratio for H1: p = p1 vs
    H0: p = p0, and stop at the FIRST crossing of the
    ln((1-beta)/alpha) / ln(beta/(1-alpha)) barriers — the
    early-stopping A/B machinery that ends experiments in a third
    of the fixed-horizon samples.

    Exact integer walk: the per-observation increments are the two
    CONSTANTS floor(ln(p1/p0)*1e6) and floor(ln((1-p1)/(1-p0))*1e6)
    (both engines share IEEE ln — the recrawl-schedule precedent —
    and floor pins the scale), so LLR(n) = k*C1 + (n-k)*C0 is a
    pure long expression over one group-keyed cumulative window.
    The decision row is one groupBy(min(struct(n))) over crossing
    rows; undecided groups report their final state as 'continue'.

    Returns (grp, n, k, llr_micro, decision)."""
    import math

    from pyspark.sql import Window
    c1 = math.floor(math.log(p1 / p0) * 1e6)
    c0 = math.floor(math.log((1 - p1) / (1 - p0)) * 1e6)
    upper = math.floor(math.log((1 - beta) / alpha) * 1e6)
    lower = math.floor(math.log(beta / (1 - alpha)) * 1e6)
    w = (Window.partitionBy(group_col)
         .orderBy(*[F.col(c).asc() for c in order_cols]))
    walked = observations.select(
        F.col(group_col).alias("grp"),
        F.row_number().over(w).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("k"))
    llr = F.col("k") * c1 + (F.col("n") - F.col("k")) * c0
    scored = walked.select(
        "grp", "n", "k", llr.alias("llr_micro"),
        F.when(llr >= upper, "accept_h1")
        .when(llr <= lower, "accept_h0").alias("decision"))
    first_cross = (scored.where(F.col("decision").isNotNull())
                   .groupBy("grp")
                   .agg(F.min(F.struct("n", "k", "llr_micro",
                                       "decision")).alias("m"))
                   .select("grp", "m.n", "m.k", "m.llr_micro",
                           "m.decision"))
    last = (scored.groupBy("grp")
            .agg(F.max(F.struct("n", "k", "llr_micro")).alias("m"))
            .select("grp", "m.n", "m.k", "m.llr_micro",
                    F.lit("continue").alias("decision")))
    undecided = last.join(first_cross.select("grp"), "grp",
                          "left_anti")
    return first_cross.unionByName(undecided)
