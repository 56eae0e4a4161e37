"""Temporal joins over the events stream table (scale extensions — the
reference has no time semantics at all, SURVEY.md §2.11 'Absent', but a
complete engine feeding a training-data pipeline needs point-in-time
joins: feature snapshots "as of" a label timestamp, attribution windows,
session stitching).

Two shapes, both deliberately shuffle-minimal:

* **as-of join** (trades↔quotes pattern): for each left event, the most
  recent right event of the same key at or before the left timestamp.
  Implemented as the classic union-tag + keyed window fill — ONE shuffle
  on the key, no range self-join, no per-row subquery. This is the shape
  that survives 100 TB: a sort-merge as-of via range join would shuffle
  both sides *and* risk quadratic bucket overlap under hot keys; the
  union form is a single exchange + per-key sort, and Spark's window
  last(ignorenulls) is a codegen'd running state, not a frame rescan.
  (DuckDB's native ASOF JOIN computes the same result but leaves
  equal-timestamp ties engine-defined; the oracle uses the explicit
  union+window SQL so the tie-break — views before purchases at equal
  ts, max event_id among equal views — is pinned in both engines.)

* **range join** (attribution window): events within (t, t+gap] of each
  anchor event, same key. Implemented as an equi-join on the key with
  the range as a residual join predicate — Catalyst keys the exchange on
  user_id (no cartesian), the range filters inside each key group. At
  100 TB the gap bound keeps per-key candidate sets small; a skewed key
  would take the salted-agg treatment (operators/skew.py).

All compared columns are exact integers (epoch micros, milli-quantized
values) per the repo-wide oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..streaming.windows import FLOOR_DAY

MILLI = "cast(round(value * 1000) as bigint)"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tie: str,
    right_vals: dict[str, str],
) -> DataFrame:
    """Generic backward as-of LEFT join: every left row picks the latest
    right row of the same ``key`` with ``right.ts <= left.ts`` (ties at
    equal ts take the right row; among equal-ts right rows the max
    ``tie`` wins — a pinned total order, unlike engine-native ASOF).

    ``right_vals`` maps output column name → right column to carry.
    Left rows with no earlier right row keep NULLs.

    Shape: union-tag + keyed window fill. ONE exchange on ``key``, one
    per-key sort shared by all fills — no range self-join (whose bucket
    overlap goes quadratic under hot keys), no per-row subquery. All
    left columns pass through."""
    out_names = list(right_vals)
    # fail loudly on name collisions: an output name or a reserved
    # __-prefixed working column that already exists on the left would
    # otherwise produce duplicate/ambiguous columns or silently wrong fills
    reserved = {"__side", *(f"__rv_{o}" for o in out_names)}
    clash = (set(out_names) | reserved) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns collide with output/reserved names: "
            f"{sorted(clash)}"
        )
    lhs = left.select(
        "*", F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(dict(right.dtypes)[src]).alias(f"__rv_{o}")
            for o, src in right_vals.items()
        ],
    )
    # right side carries only (key, ts, tie, values); left payload nulls
    rhs = right.select(
        F.col(key), F.col(ts), F.col(tie), F.lit(0).alias("__side"),
        *[F.col(src).alias(f"__rv_{o}") for o, src in right_vals.items()],
    )
    for c in left.columns:
        if c not in (key, ts, tie):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side", tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = rhs.unionByName(lhs).select(
        *left.columns, "__side",
        *[
            F.last(f"__rv_{o}", ignorenulls=True).over(w).alias(o)
            for o in out_names
        ],
    )
    return filled.filter("__side = 1").select(*left.columns, *out_names)


def asof_view_before_purchase(events: DataFrame) -> DataFrame:
    """For each purchase event: the most recent view event of the same
    user at or before the purchase timestamp (left as-of join — purchases
    with no prior view keep NULLs).

    Output: [event_id, user_id, purchase_ts_us, view_event_id,
    view_ts_us, wait_us]."""
    ev = events.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"), "event_type",
    )
    p = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts_us"
    )
    v = ev.filter("event_type = 'view'").select(
        "event_id", "user_id", "ts_us"
    )
    return asof_join(
        p, v, key="user_id", ts="ts_us", tie="event_id",
        right_vals={"view_event_id": "event_id", "view_ts_us": "ts_us"},
    ).select(
        "event_id", "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "view_event_id", "view_ts_us",
        (F.col("ts_us") - F.col("view_ts_us")).alias("wait_us"),
    )


def duck_asof_sql(table: str = "events") -> str:
    """Union+window twin of asof_view_before_purchase (equivalent to
    DuckDB's ASOF LEFT JOIN up to its engine-defined tie-break)."""
    return f"""(
      WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        FROM {table}
      ), tagged AS (
        SELECT user_id, ts_us, 0 AS side, event_id,
               event_id AS v_eid, ts_us AS v_ts
        FROM ev WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts_us, 1 AS side, event_id, NULL, NULL
        FROM ev WHERE event_type = 'purchase'
      ), filled AS (
        SELECT user_id, ts_us, side, event_id,
               last_value(v_eid IGNORE NULLS) OVER w AS view_event_id,
               last_value(v_ts IGNORE NULLS) OVER w AS view_ts_us
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
                     ROWS UNBOUNDED PRECEDING)
      )
      SELECT event_id, user_id, ts_us AS purchase_ts_us,
             view_event_id, view_ts_us,
             ts_us - view_ts_us AS wait_us
      FROM filled WHERE side = 1
    )"""


def follow_window_stats(events: DataFrame, gap_sec: int = 3600) -> DataFrame:
    """Attribution range join: per signup event, count + milli-value sum
    of the same user's events in (signup_ts, signup_ts + gap].

    Output: [event_id, user_id, signup_ts_us, n_follow, value_milli]."""
    gap_us = gap_sec * 1_000_000
    ev = events.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type", F.expr(MILLI).alias("vm"),
    )
    s = ev.filter("event_type = 'signup'").select(
        F.col("event_id").alias("s_eid"),
        F.col("user_id").alias("s_uid"),
        F.col("ts_us").alias("s_ts"),
    )
    f = ev.select("user_id", "ts_us", "vm")
    return (
        s.join(
            f,
            (s.s_uid == f.user_id)
            & (f.ts_us > s.s_ts)
            & (f.ts_us <= s.s_ts + F.lit(gap_us)),
            "left",
        )
        .groupBy("s_eid", "s_uid", "s_ts")
        .agg(
            F.count("ts_us").alias("n_follow"),
            F.coalesce(F.sum("vm"), F.lit(0)).alias("value_milli"),
        )
        .select(
            F.col("s_eid").alias("event_id"),
            F.col("s_uid").alias("user_id"),
            F.col("s_ts").alias("signup_ts_us"),
            "n_follow", "value_milli",
        )
    )


def duck_follow_window_sql(table: str = "events", gap_sec: int = 3600) -> str:
    gap_us = gap_sec * 1_000_000
    return f"""(
      WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               event_type, {MILLI} AS vm
        FROM {table}
      ), s AS (
        SELECT event_id AS s_eid, user_id AS s_uid, ts_us AS s_ts
        FROM ev WHERE event_type = 'signup'
      )
      SELECT s.s_eid AS event_id, s.s_uid AS user_id,
             s.s_ts AS signup_ts_us,
             count(f.ts_us) AS n_follow,
             cast(coalesce(sum(f.vm), 0) as bigint) AS value_milli
      FROM s LEFT JOIN ev f
        ON s.s_uid = f.user_id
       AND f.ts_us > s.s_ts AND f.ts_us <= s.s_ts + {gap_us}
      GROUP BY s.s_eid, s.s_uid, s.s_ts
    )"""


# --------------------------------------------------------------------------
# Time-series shape similarity (SAX-style motif matching)
# --------------------------------------------------------------------------

def _motif_pattern_expr(w: int) -> str:
    """Shared base-3 pattern arithmetic over columns s, s1..s{w-1} —
    identical text in both dialects so the encoders cannot drift (the
    same single-source discipline as sketch._hll_est_expr)."""
    return " + ".join(
        [f"s * {3 ** (w - 1)}"]
        + [f"s{i} * {3 ** (w - 1 - i)}" for i in range(1, w)]
    )


def _motif_notnull(w: int) -> str:
    return " AND ".join(f"s{i} IS NOT NULL" for i in range(1, w))


def series_similarity(
    events: DataFrame, w: int = 7, min_shared: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distributed time-series similarity search over the per-user daily
    value series, in the shape of the ICDE/VLDB distributed-similarity
    line of work (REPOSE, Odyssey — see PAPERS.md): discretize each
    series into SHAPE symbols, index fixed-width symbol windows, and
    bucket-join on the window pattern so candidate generation is an
    equi-join — never an all-pairs scan.

    Pipeline (all integer-exact, so the DuckDB twin hashes identically):
    1. per user/day, last observed value (milli-units) — one windowed
       argmax per user-day;
    2. day-over-day derivative symbol: 0=down, 1=flat, 2=up (SAX on the
       derivative — shape, not level, so users with offset baselines
       still match);
    3. every w consecutive symbols → one base-3 pattern id via literal
       lead() indices (stays in codegen);
    4. self-equi-join on (window start day, pattern id) — CO-MOVEMENT:
       two users match when their series move the same way over the
       same w days. Count matching windows per pair, keep pairs with
       ≥ min_shared.

    Output: [user_a, user_b, n_shared], user_a < user_b.

    Joining on day+pattern (not pattern alone) is what makes this sound
    on signal-free data: pattern-only buckets collide by chance at a
    rate of n_windows²/3^w (measured ~11k of 11k possible pairs at
    sf0.01 — pure noise), while day-aligned matches require the same
    motif at the same time. w=7 puts per-aligned-window chance at
    ~2^-7, and min_shared=2 squares it (sf0.01: 597 of 11,175 possible
    pairs survive — the coincidence floor for this fixture's i.i.d.
    series; real co-moving series stand far above it).

    Scale: the symbol/window stages are per-user windows over daily rows
    (tiny vs raw events — one row per user-day); the join is bucketed by
    (day, pattern). A hot bucket (market-wide move: many users, same
    day, same motif) makes the join output-quadratic — measured at sf10:
    periodic series pin ~4,700 users into single (day, pattern) buckets
    = 2.75 BILLION in-bucket pairs, and the sf100 run spilled past the
    disk (BASELINE.md r7). ``max_bucket`` is the hot-bucket skew guard
    (same dial as textops.lsh_candidate_pairs): (day, pattern) keys
    held by more than max_bucket users are skipped before the self-join
    via a window count over the join key itself (no extra exchange). A
    market-wide motif shared by thousands of users carries ~zero
    similarity information (it would match everyone); genuinely
    co-moving pairs still meet in their other, rarer aligned windows —
    the planted-pair test pins zero recall loss at max_bucket=4."""
    daily = (
        events.select(
            "user_id",
            F.expr(f"cast({FLOOR_DAY} as bigint)").alias("day"),
            F.expr(MILLI).alias("vm"),
            F.expr("unix_micros(ts)").alias("ts_us"),
            "event_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "day")
                .orderBy(F.desc("ts_us"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "day", "vm")
    )
    ww = Window.partitionBy("user_id").orderBy("day")
    sym = (
        daily.withColumn("prev", F.lag("vm").over(ww))
        .filter("prev IS NOT NULL")
        .select(
            "user_id", "day",
            F.expr(
                "CASE WHEN vm > prev THEN 2 WHEN vm = prev THEN 1 "
                "ELSE 0 END"
            ).alias("s"),
        )
    )
    # pattern id over w consecutive symbols: base-3 via literal leads
    leads = [F.lead("s", i).over(ww).alias(f"s{i}") for i in range(1, w)]
    pats = (
        sym.select("user_id", "day", "s", *leads)
        .filter(_motif_notnull(w))
        .select(
            "user_id", "day",
            F.expr(_motif_pattern_expr(w)).alias("pattern"),
        )
    )
    if max_bucket is not None:
        wb = Window.partitionBy("day", "pattern")
        pats = (
            pats.withColumn("_bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    a, b = pats.alias("a"), pats.alias("b")
    return (
        a.join(b, ["day", "pattern"])
        .filter(F.expr("a.user_id < b.user_id"))
        .select(
            F.expr("a.user_id").alias("user_a"),
            F.expr("b.user_id").alias("user_b"),
        )
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _duck_bucket_qualify(max_bucket: int | None) -> str:
    """Twin of the max_bucket prune: QUALIFY over the same window
    (DuckDB's post-window filter — same shape as textops')."""
    if max_bucket is None:
        return ""
    return (
        "QUALIFY count(*) OVER (PARTITION BY day, pattern)"
        f" <= {max_bucket}"
    )


def duck_series_similarity_sql(
    table: str = "events", w: int = 7, min_shared: int = 2,
    max_bucket: int | None = None,
) -> str:
    pat = _motif_pattern_expr(w)
    lead_cols = ", ".join(
        f"lead(s, {i}) OVER (PARTITION BY user_id ORDER BY day) AS s{i}"
        for i in range(1, w)
    )
    notnull = _motif_notnull(w)
    from ..streaming.windows import duck_floor_day

    fday = duck_floor_day("epoch_us(ts)")
    return f"""(
      WITH daily AS (
        SELECT user_id, day, vm FROM (
          SELECT user_id, {fday} AS day,
                 {MILLI} AS vm,
                 row_number() OVER (
                   PARTITION BY user_id, {fday}
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM {table}
        ) _d WHERE rn = 1
      ), sym AS (
        SELECT user_id, day,
               CASE WHEN vm > prev THEN 2 WHEN vm = prev THEN 1
                    ELSE 0 END AS s
        FROM (
          SELECT user_id, day, vm,
                 lag(vm) OVER (PARTITION BY user_id ORDER BY day) AS prev
          FROM daily
        ) _l WHERE prev IS NOT NULL
      ), pats AS (
        SELECT user_id, day, pattern FROM (
          SELECT user_id, day, {pat} AS pattern FROM (
            SELECT user_id, day, s, {lead_cols} FROM sym
          ) _w WHERE {notnull}
        ) _p
        {_duck_bucket_qualify(max_bucket)}
      )
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             count(*) AS n_shared
      FROM pats a JOIN pats b USING (day, pattern)
      WHERE a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
      HAVING count(*) >= {min_shared}
    )"""
