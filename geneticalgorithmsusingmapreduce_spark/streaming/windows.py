"""Event-time windowed aggregations over the ``events`` stream table.

The reference has **no** time semantics (SURVEY.md §2.11 'Absent' — its
only streaming-adjacent feature is the incremental-reduction fork flag,
T1). These operators are engine *extensions*, marked as such, giving the
`events` fixture a Structured-Streaming-shaped surface: the same transform
functions run in batch mode (DuckDB-oracle-checked) and under
``readStream`` with a watermark (tested with a file stream).

Exactness discipline for the oracle:
* the fixture's timestamps are parquet TIMESTAMP(NANOS), which Spark can't
  read natively — sources.registry.read_events flips the runtime conf
  ``spark.sql.legacy.parquet.nanosAsLong`` and floor-converts to
  microsecond timestamps (DuckDB mirrors with epoch_ns // 1000);
* every compared output column is an integer: window starts as epoch
  seconds/micros, ``value`` sums quantized to milli-units — no
  float-summation-order or timestamp-dtype hash hazards.

Scale: tumbling/sliding windows are hash aggregations keyed by
(window_start, type) — partial map-side aggs, one shuffle on the window
key. Session windows use Spark's native session_window (state-store-backed
under streaming); the batch oracle is gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MILLI = "cast(round(value * 1000) as bigint)"
DUCK_TS_US = "(epoch_ns(ts) // 1000)"  # floor to µs, matches Spark reader
# exact integer floor(unix_micros/day): BOTH Spark's `div` and DuckDB's
# integer `//` truncate toward zero (verified: -1 // 86400000000 = 0 in
# both — the r4 ADVICE note that DuckDB floors holds only for FLOAT
# operands), so a pre-epoch (negative-micros) timestamp needs the same
# correction term in BOTH dialects to land in the previous day, which is
# what a day bucket means (r4 ADVICE). `%` takes the dividend's sign in
# both engines, so the idiom is shared.
DAY_US = 86_400_000_000
FLOOR_DAY = (
    f"((unix_micros(ts) div {DAY_US}) - "
    f"(CASE WHEN unix_micros(ts) % {DAY_US} < 0 THEN 1 ELSE 0 END))"
)


def duck_floor_day(us_expr: str) -> str:
    """DuckDB twin of FLOOR_DAY over any integer-micros expression."""
    return (
        f"((({us_expr}) // {DAY_US}) - "
        f"(CASE WHEN (({us_expr}) % {DAY_US}) < 0 THEN 1 ELSE 0 END))"
    )


def tumbling(events: DataFrame, width_sec: int = 3600) -> DataFrame:
    """Tumbling event-time windows; window_start in epoch seconds.

    Groups on the raw window() column (not a projection of it) so the
    event-time/watermark association survives for streaming append mode;
    the epoch-seconds projection happens after the aggregation."""
    return (
        events.groupBy(F.window("ts", f"{width_sec} seconds"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(MILLI)).alias("value_milli"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "value_milli",
        )
    )


def duck_tumbling_sql(table: str = "events", width_sec: int = 3600) -> str:
    return f"""(
      SELECT ({DUCK_TS_US} // 1000000 // {width_sec}) * {width_sec} AS window_start,
             event_type, count(*) AS n,
             cast(sum({MILLI}) as bigint) AS value_milli
      FROM {table} GROUP BY 1, 2
    )"""


def sliding(
    events: DataFrame, width_sec: int = 3600, slide_sec: int = 1800
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    return (
        events.groupBy(
            F.window("ts", f"{width_sec} seconds", f"{slide_sec} seconds"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(MILLI)).alias("value_milli"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "value_milli",
        )
    )


def duck_sliding_sql(
    table: str = "events", width_sec: int = 3600, slide_sec: int = 1800
) -> str:
    k = width_sec // slide_sec
    return f"""(
      WITH base AS (
        SELECT ({DUCK_TS_US} // 1000000 // {slide_sec}) * {slide_sec} AS b,
               event_type, {MILLI} AS vm
        FROM {table}
      ), expl AS (
        SELECT b - o * {slide_sec} AS window_start, event_type, vm
        FROM base CROSS JOIN range(0, {k}) _o(o)
      )
      SELECT window_start, event_type, count(*) AS n,
             cast(sum(vm) as bigint) AS value_milli
      FROM expl GROUP BY 1, 2
    )"""


def session(events: DataFrame, gap_sec: int = 600) -> DataFrame:
    """Per-user gap-based session windows; session_start in epoch micros."""
    # group on the raw session_window column — Spark's analyzer special-
    # cases it to merge overlapping per-row windows; wrapping it in an
    # expression here would silently degrade to one "session" per row
    return (
        events.groupBy(
            F.session_window("ts", f"{gap_sec} seconds"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(MILLI)).alias("value_milli"),
        )
        .select(
            F.unix_micros(F.col("session_window.start")).alias("session_start"),
            "user_id",
            "n",
            "value_milli",
        )
    )


def duck_session_sql(table: str = "events", gap_sec: int = 600) -> str:
    """Gaps-and-islands twin of session_window (new session when the gap
    to the previous event is ≥ gap — session extends to last event + gap,
    exclusive)."""
    return f"""(
      WITH o AS (
        SELECT user_id, {DUCK_TS_US} AS us, {MILLI} AS vm FROM {table}
      ), lagd AS (
        SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
        FROM o
      ), marked AS (
        SELECT *, CASE WHEN prev_us IS NULL
                        OR us - prev_us >= {gap_sec} * 1000000
                   THEN 1 ELSE 0 END AS new_session
        FROM lagd
      ), grp AS (
        SELECT *, sum(new_session) OVER
                 (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
      )
      SELECT min(us) AS session_start, user_id,
             count(*) AS n, cast(sum(vm) as bigint) AS value_milli
      FROM grp GROUP BY user_id, sid
    )"""


def with_watermark_tumbling(
    stream: DataFrame, width_sec: int = 3600, delay: str = "30 minutes"
) -> DataFrame:
    """Streaming form: the same tumbling aggregation behind a watermark
    (late rows beyond ``delay`` dropped, closed-window state evicted).
    Batch mode ignores the watermark — which is how the oracle checks the
    transform itself."""
    return tumbling(stream.withWatermark("ts", delay), width_sec)
