"""Ordered-funnel analytics over an event stream.

Step-k conversion ("view → click → purchase, in that order") is a
sequence predicate, not a plain aggregate.  The classic formulations
are either a per-user collect+sort (Python/driver-ish) or k-1
self-joins; this module uses neither: one conditional-aggregation pass
per step over the SAME user-partitioned exchange.

Scale shape: step 1 is `min(ts) FILTER (type = s1)` per user; step i
is `min(ts) FILTER (type = s_i AND ts > t_{i-1})`, which needs t_{i-1}
joined back — a user-keyed equi-join of two frames that are both
already hash-partitioned on user from the previous aggregate, so AQE
plans every join shuffle-free after the first exchange.  All state is
one row per user per step; nothing collects, nothing sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str | list[str] = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each ordered funnel step.

    Returns one row per user who completed step 1, with columns
    ``t1..tk`` (timestamp of the earliest valid occurrence of each
    step strictly after the previous step's time; NULL once the chain
    breaks).  'Earliest-valid' is the standard greedy semantics: the
    first step-1 event, then the first step-2 event after it, etc. —
    greedy is optimal for existence ("did the user convert") because
    taking an earlier t_{i} never eliminates a later t_{i+1}.

    Dataflow — ONE key exchange for the whole chain (the r4 plan audit
    showed the per-step join formulation re-exchanging on every step:
    14 shuffles for a 3-step session funnel).  Step-i candidacy is a
    RUNNING-MIN rewrite of the greedy join: an s_i event at time t
    qualifies iff some step-(i-1) completion happened strictly before
    it, i.e. iff the running min ``r_{i-1}`` over the key's time order
    is ``< t`` (r_{i-1} < t  ⟺  t_{i-1} < t: rows with smaller ts are
    always in the frame, and an equal-ts tie can only set r = t, which
    the strict ``<`` ignores — the exact `ts > t_prev` join predicate).
    The k running mins are chained window columns over the SAME window
    spec, so the physical plan is one Exchange+Sort with k stacked
    Window operators, and the final conditional aggregate groups on the
    partition keys — colocated, exchange-free.

    ``user_col`` may be a list of columns (composite key, e.g.
    (user, session)); partitioning by a superset of an upstream
    window's keys reuses its exchange (hash(user) satisfies clustering
    on (user, session)).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    ev = events.select(
        *keys, F.col(ts_col).alias("_fts"), F.col(type_col).alias("_fetype")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_fts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    conds = [F.col("_fetype") == steps[0]]
    cur = ev
    for i, step in enumerate(steps[1:], start=2):
        cur = cur.withColumn(
            f"_r{i-1}", F.min(F.when(conds[-1], F.col("_fts"))).over(w)
        )
        conds.append(
            (F.col("_fetype") == step) & (F.col(f"_r{i-1}") < F.col("_fts"))
        )
    out = cur.groupBy(*keys).agg(
        *[
            F.min(F.when(c, F.col("_fts"))).alias(f"t{i}")
            for i, c in enumerate(conds, start=1)
        ]
    )
    return out.where(F.col("t1").isNotNull())


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table: one row per step with the number of
    users reaching it and the conversion rate vs step 1 (6 dp — exact
    integer division, engine-deterministic).  The per-step counts are
    one aggregate over funnel_times' per-user frame; the step axis is
    built with an explicit values list (no dynamic pivot job)."""
    ft = funnel_times(events, steps, user_col, ts_col, type_col)
    counts = ft.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # One explode over the 1-row counts frame instead of a per-step
    # union: the counts subplan (and everything under it) is evaluated
    # once, not len(steps) times.
    step_structs = [
        F.struct(
            F.lit(i).alias("step_no"),
            F.lit(step).alias("step"),
            F.col(f"n{i}").alias("n_users"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    ex = counts.select(
        F.col("n1"), F.explode(F.array(*step_structs)).alias("s")
    )
    return ex.select(
        F.col("s.step_no").alias("step_no"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        F.round(
            F.col("s.n_users").cast("double") / F.col("n1"), 6
        ).alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen period
    (cohort), counted distinct-active per period offset — the
    product-analytics standard for "how many of week-N's new users
    came back k weeks later".

    Scale shape: the first-seen aggregate and the distinct-activity
    projection are both keyed on user, so their join is co-partitioned
    (one user exchange feeds both sides under AQE); the final
    (cohort, offset) rollup has bounded cardinality (#periods²).
    Offsets are exact integer day-diffs over period-truncated
    timestamps — no float time arithmetic."""
    first = events.groupBy(F.col(user_col).alias("user")).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("cohort")
    )
    activity = (
        events.select(
            F.col(user_col).alias("user"),
            F.date_trunc(granularity, F.col(ts_col)).alias("wk"),
        )
        .distinct()
    )
    days = F.datediff(F.to_date("wk"), F.to_date("cohort"))
    per = 7 if granularity == "week" else 1
    return (
        activity.join(first, "user")
        .groupBy(
            "cohort",
            (days / per).cast("int").alias("period_offset"),
        )
        .agg(F.count_distinct("user").alias("n_active"))
    )


def pattern_a_then_b_without_c(
    df: DataFrame,
    a: str,
    b: str,
    deny: str,
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Complex-event pattern: for every A event, did a B follow within
    T seconds WITHOUT a deny event (C) in between — MATCH_RECOGNIZE's
    bread-and-butter shape (fraud checks, abandoned-cart alerts,
    SLA breach detection), which neither ksqlDB's reference surface nor
    Spark exposes natively.

    Dataflow — no interval self-join anywhere: one user-keyed window
    computes the running deny count; the A→B step is the ordered as-of
    join (operators/asof.py, forward, strict, tolerance=T — one
    shuffle, no candidate expansion); "no C between" falls out as a
    SUBTRACTION of running counts (deny_between = cum_at_B − cum_at_A),
    because denies partition the (ts, id) order.  Returns one row per A:
    matched (B exists within T), blocked (a deny intervened),
    fired (matched ∧ ¬blocked), gap_s.
    """
    from .asof import asof_join

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cum = F.sum((F.col(type_col) == deny).cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    base = df.select(
        user_col, ts_col, id_col, type_col, cum.alias("_cum")
    )
    A = base.filter(F.col(type_col) == a).select(
        user_col, ts_col, id_col, F.col("_cum").alias("_ca")
    )
    B = base.filter(F.col(type_col) == b).select(
        user_col,
        F.col(ts_col).alias("_b_ts"),
        F.col("_cum").alias("_cb"),
    )
    j = asof_join(
        A,
        B,
        on=[user_col],
        left_ts=ts_col,
        right_ts="_b_ts",
        direction="forward",
        strict=True,
        tolerance=float(within_seconds),
        how="left",
    )
    matched = F.col("_b_ts").isNotNull()
    blocked = matched & (F.col("_cb") - F.col("_ca") > 0)
    gap = F.when(
        matched,
        F.col("_b_ts").cast("double") - F.col(ts_col).cast("double"),
    )
    return j.select(
        user_col,
        id_col,
        F.col(ts_col),
        matched.alias("matched"),
        F.coalesce(blocked, F.lit(False)).alias("blocked"),
        (matched & ~F.coalesce(blocked, F.lit(False))).alias("fired"),
        F.round(gap, 6).alias("gap_s"),
    )


def session_funnel(
    events: DataFrame,
    steps: list[str],
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Funnel conversion at SESSION granularity: the ordered chain must
    complete within one inactivity-bounded visit, not across a user's
    lifetime — the form product analytics actually reports ("in-session
    conversion").  Sessions come from the standard gap rule (new
    session when the user pauses > gap_seconds), assigned with one
    lag + running-sum window — the same key-local topology as
    scd2_history's version counter, and expressible identically in
    SQL (unlike F.session_window, whose merge step has no oracle twin).

    The per-session funnel then REUSES funnel_times on the composite
    (user, session) key: funnel_times partitions by (user, _sid),
    whose clustering requirement is already satisfied by the session
    window's hash(user) exchange — the whole query runs on ONE data
    shuffle (r4 plan: 14).  Returns one row per step:
    (step_no, step, n_sessions, conversion vs step 1).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = (
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_seconds)
    ).cast("int")
    sess = events.withColumn(
        "_sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ft = funnel_times(sess, steps, user_col=[user_col, "_sid"], ts_col=ts_col,
                      type_col=type_col)
    counts = ft.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    step_structs = [
        F.struct(
            F.lit(i).alias("step_no"),
            F.lit(s).alias("step"),
            F.col(f"n{i}").alias("n_sessions"),
            F.round(F.col(f"n{i}") / F.col("n1"), 6).alias("conversion"),
        )
        for i, s in enumerate(steps, start=1)
    ]
    return counts.select(
        F.explode(F.array(*step_structs)).alias("r")
    ).select("r.*")
