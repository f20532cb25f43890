"""Event-stream analytics: funnels, cohort retention, outlier flagging.

The product-analytics queries every events table grows (Mixpanel/
Amplitude's core surface), absent from the reference (its only derived
tables are resample/describe/mode — SURVEY §2.4). All three are
join/aggregation plans over the same ``(user, ts)`` shuffle family the
resample already pays, so a sink bucketed by user serves them
shuffle-free at 100 TB.

- **Funnel** — ordered-step conversion: step k counts users whose first
  step-k event happens strictly AFTER their first step-(k−1) event. The
  sequential dependence is expressed as a chain of per-user min-ts
  aggregations and semi-shaped joins (one tiny per-user frame per step,
  each ≤ one row per user), never a row-by-row scan.
- **Retention** — cohort = the user's first active week; one row per
  (cohort week, week offset) counting still-active users, with the
  share of the cohort. Two aggregations and a broadcast-sized join of
  per-user firsts.
- **Outliers** — per-group z-score flags (|z| > threshold) against the
  group's mean/stddev, one aggregation + one broadcast join; the
  robust-statistics cousin of sketches.approx_profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users, pct_of_first) — users converting
    through each ordered step (first step-k event strictly after the
    user's first step-(k−1) event)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    cur = (df.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("__t")))
    per_user = [cur]
    for s in steps[1:]:
        cur = (
            df.where(F.col(type_col) == s)
            .join(cur.select(user_col, F.col("__t").alias("__prev")),
                  user_col)
            .where(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        )
        per_user.append(cur)
    # fully lazy: per-step scalar counts union into one frame; the
    # step-0 count broadcasts for the share column. No driver collects.
    step_counts = None
    for i, (s, pu) in enumerate(zip(steps, per_user)):
        c = pu.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"), "n_users")
        step_counts = c if step_counts is None else step_counts.unionByName(c)
    first = per_user[0].agg(F.count("*").cast("double").alias("__n1"))
    return (
        step_counts.crossJoin(F.broadcast(first))
        .select(
            "step_idx", "step", "n_users",
            F.when(F.col("__n1") > 0,
                   F.round(F.col("n_users") / F.col("__n1"), 6))
            .otherwise(F.lit(0.0)).alias("pct_of_first"),
        )
    )


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users, pct) — weekly cohort
    retention. Week 0 is each user's first active week; pct is the share
    of the cohort still active at the offset."""
    weeks = df.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).alias("__w")).distinct()
    cohort = weeks.groupBy(user_col).agg(F.min("__w").alias("cohort_week"))
    active = (
        weeks.join(cohort, user_col)
        .select(
            user_col, "cohort_week",
            (F.datediff(F.col("__w"), F.col("cohort_week")) / 7)
            .cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
    sizes = (cohort.groupBy("cohort_week")
             .agg(F.count("*").cast("bigint").alias("__size")))
    return (
        active.join(sizes, "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_users",
            F.round(F.col("n_users") / F.col("__size"), 6).alias("pct"),
        )
    )


def outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates > ``z_threshold`` group standard
    deviations from the group mean: (id, groups…, value, z)."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"))
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sd")
    return (
        df.join(F.broadcast(stats), group_cols)
        .where(F.col("__sd") > 0)
        .withColumn("z", F.round(z, 6))
        .where(F.abs(F.col("z")) > z_threshold)
        .select(id_col, *group_cols, value_col, "z")
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts (Markov matrix in tall form): for
    each key's event sequence, count (prev_state -> state) pairs, plus
    the per-source probability. One window shuffle on the key to form
    lag pairs, one aggregation on the (from, to) pair — the pair space
    is |states|², so the second aggregate is map-side dominated at any
    scale."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    pairs = (
        df.select(key_col, ts_col, state_col, tiebreak_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .where(F.col("__prev").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("__prev").alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    w_src = Window.partitionBy("from_state")
    return counts.withColumn(
        "p",
        F.round(F.col("n_transitions")
                / F.sum("n_transitions").over(w_src), 6))


def rolling_active(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct actives: for every observed day, the EXACT count
    of distinct ids seen in the trailing ``window_days`` window — the
    WAU/MAU metric, computed without any windowed count-distinct (which
    Spark can't do exactly) and without a per-day self-join.

    Plan: dedupe to (id, day) — the only pass over the raw events — then
    each (id, day) is EXPLODED to the ``window_days`` target days it
    contributes to (codegen ``sequence``, fan-out = window size, not
    data size) and one count-distinct aggregate per target day finishes
    it. Days past the observed range are clipped with a semi join on the
    observed-day set. At 100 TB the raw table is touched once; the
    exploded frame is |distinct (id, day)| × window — bounded,
    pre-shrunk, and uniformly distributed over day keys.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    id_days = df.select(F.col(id_col).alias("__id"),
                        day.alias("__day")).distinct()
    observed = id_days.select("__day").distinct()
    contrib = id_days.select(
        "__id",
        F.explode(F.sequence(
            F.col("__day"), F.date_add(F.col("__day"), window_days - 1)
        )).alias("day"),
    )
    return (
        contrib.join(observed.withColumnRenamed("__day", "day"), "day",
                     "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("__id").cast("bigint").alias("n_active"))
    )


def user_activity_profile(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user behavioral profile — the bot/spam-screening shape for
    event streams: (user, n_events, n_types, mean_gap_s, cv_gap,
    burstiness, type_entropy).

    - ``mean_gap_s`` / ``cv_gap``: inter-arrival seconds (lag over the
      (ts, id)-ordered series; id breaks timestamp ties) — machines emit
      metronome gaps (cv → 0), humans are bursty (cv > 1).
    - ``burstiness``: Goh-Barabási B = (σ−μ)/(σ+μ) ∈ (−1, 1); −1 ≡
      periodic, 0 ≡ Poisson, → 1 ≡ extreme bursts.
    - ``type_entropy``: Shannon entropy (nats) of the user's event-type
      mix — single-action accounts score 0. The Σ p·ln p fold runs in
      TYPE-SORTED order (sorted-array fold, the bm25 precedent) so the
      float sum is engine- and layout-deterministic.

    One window sort + two aggregations, all shuffles on the user id.
    Users with < 2 events carry null gap stats (no interval exists).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = (F.unix_micros(F.col(ts_col))
           - F.unix_micros(F.lag(ts_col).over(w))) / 1_000_000.0
    gaps = (
        df.withColumn("__gap", gap)
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.avg("__gap").alias("__mu"),
             F.stddev_samp("__gap").alias("__sd"))
    )
    tc = df.groupBy(user_col, type_col).agg(
        F.count(F.lit(1)).cast("double").alias("__c"))
    ent = (
        tc.withColumn("__tot", F.sum("__c").over(
            Window.partitionBy(user_col)))
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"),
             F.sort_array(F.collect_list(F.struct(
                 F.col(type_col).alias("t"),
                 (-(F.col("__c") / F.col("__tot"))
                  * F.log(F.col("__c") / F.col("__tot"))).alias("e"))))
             .alias("__arr"))
        .select(user_col, "n_types",
                F.round(F.aggregate(
                    F.transform("__arr", lambda s: s["e"]),
                    F.lit(0.0), lambda acc, x: acc + x), 6)
                .alias("type_entropy"))
    )
    return (
        gaps.join(ent, user_col)
        .select(
            user_col, "n_events", "n_types",
            F.round("__mu", 6).alias("mean_gap_s"),
            F.round(F.when(F.col("__mu") > 0, F.col("__sd") / F.col("__mu")),
                    6).alias("cv_gap"),
            F.round(F.when((F.col("__sd") + F.col("__mu")) > 0,
                           (F.col("__sd") - F.col("__mu"))
                           / (F.col("__sd") + F.col("__mu"))), 6)
            .alias("burstiness"),
            "type_entropy",
        )
    )
