"""Funnel analysis over event streams — ordered step sequences within a
time window.

Beyond-reference event analytics (the reference is graph-only): given an
ordered list of step event types, count how many users completed each
prefix with every step landing within ``within_seconds`` of the previous
one. Semantics are **first-touch greedy** (the convention of the major
product-analytics tools): step 1 anchors at the user's earliest
occurrence, and each later step takes the earliest qualifying occurrence
after the previous step's chosen time. Greedy-first is deterministic and
replayable in plain SQL — which is what makes the operator
oracle-checkable — at the cost of missing chains that only a later
anchor would complete (documented, intentional).

100 TB posture: one filtered scan per step (`event_type` pushed to the
parquet scan), each stage a user-keyed equi-join + ``min`` aggregate —
partial-aggregatable, shuffle keyed on the user id, no windows over the
raw event table and no per-user event arrays (hub users cost nothing
extra). Steps are typically 3-6, so the join chain is short and static.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import GraphFramesError


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user first-touch chain times — DF[<user>, t1..tk (timestamp,
    null once the chain breaks)]. The per-user detail behind
    :func:`funnel`; feed it to cohort splits or time-to-convert stats."""
    if len(steps) < 1:
        raise GraphFramesError("funnel needs at least one step")
    if within_seconds <= 0:
        raise GraphFramesError(f"within_seconds must be > 0, got {within_seconds}")
    interval = F.expr(f"INTERVAL {int(within_seconds)} SECONDS")

    chain = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_ts")
        )
        prev = f"t{k - 1}"
        hit = (
            chain.join(nxt, on=user_col)
            .filter(
                (F.col("_ts") > F.col(prev))
                & (F.col("_ts") <= F.col(prev) + interval)
            )
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{k}"))
        )
        chain = chain.join(hit, on=user_col, how="left")
    return chain


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel step counts — DF[step, event_type, n_users], one row per
    step with the number of users whose first-touch chain reached it
    (``n_users`` is non-increasing by construction)."""
    times = funnel_times(
        events, steps, within_seconds, user_col, ts_col, type_col
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t{k}")).alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    per_step = [
        F.struct(
            F.lit(k).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"n{k}").alias("n_users"),
        )
        for k, step in enumerate(steps, start=1)
    ]
    return counts.select(
        F.explode(F.array(*per_step)).alias("_s")
    ).select("_s.step", "_s.event_type", "_s.n_users")


def retention(
    events: DataFrame,
    periods: int = 8,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix — DF[cohort (date), period (int),
    n_cohort, n_active, retention]: users grouped by the ``period_days``
    bucket of their first-ever event (cohort anchored at the Monday
    week-truncation of that first event when ``period_days=7``, else at
    day granularity from the same anchor), and for each later period
    the fraction of the cohort with at least one event in it. Periods
    with zero active users are absent (sparse output); ``period`` 0 is
    the cohort period itself (retention 1.0 by construction).

    100 TB posture: one min-aggregate for first-touch (user-keyed), one
    user-keyed join back to events, one distinct + count aggregate on
    (cohort, period) — every stage partial-aggregatable, no windows
    over the raw event table, hub users cost one row per active period.
    """
    if periods < 1:
        raise GraphFramesError(f"periods must be >= 1, got {periods}")
    if period_days < 1:
        raise GraphFramesError(f"period_days must be >= 1, got {period_days}")

    firsts = events.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    anchor = (
        F.date_trunc("week", F.col("_first")).cast("date")
        if period_days == 7
        else F.col("_first").cast("date")
    )
    cohorts = firsts.select(F.col(user_col), anchor.alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    activity = (
        events.select(F.col(user_col), F.col(ts_col).cast("date").alias("_d"))
        .join(cohorts, on=user_col)
        .select(
            user_col,
            "cohort",
            F.floor(
                F.datediff(F.col("_d"), F.col("cohort")) / F.lit(period_days)
            ).cast("int").alias("period"),
        )
        .filter(F.col("period") < F.lit(periods))
        .distinct()
    )
    active = activity.groupBy("cohort", "period").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return active.join(sizes, on="cohort").select(
        "cohort",
        "period",
        "n_cohort",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 9).alias("retention"),
    )
