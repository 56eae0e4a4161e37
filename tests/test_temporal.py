"""As-of + range join semantics and plan shapes (operators/temporal.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from geneticalgorithmsusingmapreduce_spark.operators import temporal
from geneticalgorithmsusingmapreduce_spark.sources.registry import read_events

SF = "/root/testdata/sf0.001"


def test_asof_matches_bruteforce(spark):
    ev = read_events(spark, SF)
    got = {
        r.event_id: (r.view_event_id, r.view_ts_us, r.wait_us)
        for r in temporal.asof_view_before_purchase(ev).collect()
    }
    rows = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "event_type",
    ).collect()
    views = {}
    for r in rows:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append((r.ts_us, r.event_id))
    purchases = [r for r in rows if r.event_type == "purchase"]
    assert purchases and any(v is not None for v, _, _ in got.values())
    for p in purchases:
        cands = [
            (ts, eid) for ts, eid in views.get(p.user_id, [])
            if ts <= p.ts_us
        ]
        if not cands:
            assert got[p.event_id] == (None, None, None)
        else:
            ts, eid = max(cands)  # latest ts, then max event_id
            assert got[p.event_id] == (eid, ts, p.ts_us - ts)


def test_range_join_matches_bruteforce(spark):
    ev = read_events(spark, SF)
    got = {
        r.event_id: (r.n_follow, r.value_milli)
        for r in temporal.follow_window_stats(ev).collect()
    }
    rows = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "event_type", F.expr(temporal.MILLI).alias("vm"),
    ).collect()
    signups = [r for r in rows if r.event_type == "signup"]
    assert len(got) == len(signups)
    gap = 3600 * 1_000_000
    for s in signups:
        f = [
            r.vm for r in rows
            if r.user_id == s.user_id and s.ts_us < r.ts_us <= s.ts_us + gap
        ]
        assert got[s.event_id] == (len(f), sum(f))


def test_asof_property_random_inputs(spark):
    # randomized as-of semantics vs a brute-force reference: one drawn
    # input set with many keys/ties exercises NULL fills, equal-ts
    # preference, and max-tie ordering beyond the fixture's shapes
    import random

    rng = random.Random(1234)
    lrows = [
        (rng.randrange(6), rng.randrange(30), i)
        for i in range(120)
    ]
    rrows = [
        (rng.randrange(6), rng.randrange(30), 1000 + i)
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, "k int, t int, tid int")
    right = spark.createDataFrame(rrows, "k int, t int, tid int")
    got = {
        r.tid: (r.r_tid, r.r_t)
        for r in temporal.asof_join(
            left, right, key="k", ts="t", tie="tid",
            right_vals={"r_tid": "tid", "r_t": "t"},
        ).collect()
    }
    assert len(got) == len(lrows)
    for k, t, tid in lrows:
        cands = [(rt, rtid) for rk, rt, rtid in rrows if rk == k and rt <= t]
        want = max(cands) if cands else None
        assert got[tid] == ((want[1], want[0]) if want else (None, None)), tid


def test_generic_asof_payload_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 20, 101, "b"), (2, 5, 102, "c")],
        "k int, t int, tid int, payload string",
    )
    right = spark.createDataFrame(
        [(1, 10, 201), (1, 10, 204), (1, 15, 202), (2, 99, 203)],
        "k int, t int, tid int",
    )
    out = {
        (r.k, r.t): (r.payload, r.r_tid, r.r_t)
        for r in temporal.asof_join(
            left, right, key="k", ts="t", tie="tid",
            right_vals={"r_tid": "tid", "r_t": "t"},
        ).collect()
    }
    assert out[(1, 10)] == ("a", 204, 10)  # equal-ts taken; max tie wins
    assert out[(1, 20)] == ("b", 202, 15)  # latest earlier right row
    assert out[(2, 5)] == ("c", None, None)  # nothing at-or-before


def test_asof_single_exchange_no_join(spark):
    # union-tag form: one exchange on user_id, no join operator at all
    df = temporal.asof_view_before_purchase(read_events(spark, SF))
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    p = p.split("== Initial Plan ==")[0]
    assert "Join" not in p and "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_range_join_keyed_not_cartesian(spark):
    df = temporal.follow_window_stats(read_events(spark, SF))
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    p = p.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_asof_rejects_colliding_left_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 0, "x")], "k int, t int, tid int, r_v string")
    right = spark.createDataFrame([(1, 5, 1, 7)], "k int, t int, tid int, v int")
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(
            left, right, key="k", ts="t", tie="tid", right_vals={"r_v": "v"}
        )


def test_series_similarity_comovement(spark):
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark.operators import temporal

    # users 1 and 2 move identically for 9 days (8 derivative symbols →
    # two aligned 7-wide windows); user 3 moves oppositely
    vals = [1.0, 2.0, 1.5, 3.0, 2.5, 4.0, 3.5, 5.0, 4.5]
    rows = []
    eid = 0
    for day, v in enumerate(vals):
        for uid, series in ((1, v), (2, v + 10), (3, -v)):
            rows.append((eid, day * 86_400_000_000, uid, series))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, value double"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id", "value",
    )
    got = {
        (r.user_a, r.user_b): r.n_shared
        for r in temporal.series_similarity(ev, w=7, min_shared=2).collect()
    }
    assert got == {(1, 2): 2}


def test_series_similarity_requires_day_alignment(spark):
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark.operators import temporal

    # user 2 repeats user 1's motif shifted by one day — patterns match
    # but never on the same start day, so no pair is emitted
    vals = [1.0, 2.0, 1.5, 3.0, 2.5, 4.0, 3.5, 5.0, 4.5, 6.0]
    rows = []
    eid = 0
    for day, v in enumerate(vals):
        rows.append((eid, day * 86_400_000_000, 1, v)); eid += 1
        rows.append((eid, (day + 1) * 86_400_000_000, 2, v)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, value double"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id", "value",
    )
    assert temporal.series_similarity(ev, w=7, min_shared=1).count() == 0


def test_floor_day_cross_engine_pre_epoch(spark):
    # r4 ADVICE: day buckets must FLOOR, not truncate, so pre-epoch
    # timestamps land in the previous day — and both dialects truncate
    # on integer operands by default, so BOTH carry the correction term.
    # Probe the boundary micros in Spark, DuckDB, and Python.
    import duckdb
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark.streaming.windows import (
        DAY_US, FLOOR_DAY, duck_floor_day,
    )

    probes = [-DAY_US - 1, -DAY_US, -1, 0, DAY_US - 1, DAY_US, DAY_US + 1]
    df = spark.createDataFrame([(u,) for u in probes], "us long").select(
        "us", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {r.us: r.fd for r in df.select("us", F.expr(FLOOR_DAY).alias("fd")).collect()}
    for us in probes:
        expect = us // DAY_US  # python floordiv IS floor
        assert got[us] == expect, (us, got[us], expect)
        d = duckdb.sql(f"SELECT {duck_floor_day(str(us))}").fetchone()[0]
        assert d == expect, (us, d, expect)


def test_series_similarity_hot_bucket_guard(spark):
    import duckdb
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark.operators import temporal

    # 12 "market" users share one strictly-rising motif (a hot
    # (day, pattern) bucket of 12 — no similarity information, 66
    # chance pairs); users 100/101 co-move on a DISTINCT zig-zag motif
    # (bucket of 2 — real signal). With max_bucket=4 the hot bucket is
    # skipped, the planted pair survives.
    rise = [float(i) for i in range(9)]          # derivative: all 2s
    zig = [1.0, 2.0, 1.5, 3.0, 2.5, 4.0, 3.5, 5.0, 4.5]
    rows, eid = [], 0
    for day in range(9):
        for uid in range(12):
            rows.append((eid, day * 86_400_000_000, uid, rise[day]))
            eid += 1
        for uid, off in ((100, 0.0), (101, 10.0)):
            rows.append((eid, day * 86_400_000_000, uid, zig[day] + off))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, value double"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id", "value",
    )
    uncapped = {
        (r.user_a, r.user_b)
        for r in temporal.series_similarity(ev, w=7, min_shared=2).collect()
    }
    capped = {
        (r.user_a, r.user_b)
        for r in temporal.series_similarity(
            ev, w=7, min_shared=2, max_bucket=4
        ).collect()
    }
    assert (100, 101) in uncapped and len(uncapped) == 66 + 1
    assert capped == {(100, 101)}  # hot bucket gone, signal intact

    # cross-engine: the DuckDB twin with the same cap hashes identically
    con = duckdb.connect()
    con.register("events_py", ev.toPandas())
    con.execute("CREATE VIEW events AS SELECT * FROM events_py")
    duck = {
        (a, b) for a, b, _ in con.sql(
            "SELECT * FROM " + temporal.duck_series_similarity_sql(
                max_bucket=4
            ) + " _q"
        ).fetchall()
    }
    assert duck == capped
