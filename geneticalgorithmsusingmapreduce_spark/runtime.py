"""Scoped persist registry (r5 ADVICE: textops/ann persists leaked one
cache entry per call for the session lifetime on the gate/pipeline
paths, where nothing ever called clearCache).

Operators that persist a shared subtree (both sides of a self-join, a
fold referenced by two branches) register the handle here via
``scoped_persist`` instead of calling ``.persist()`` raw.  The catalog's
``register`` wrapper drains the registry when the NEXT entry is built,
so a persisted subtree lives exactly as long as the entry that created
it can still be materialized.  Releasing early is always safe — an
unpersisted DataFrame recomputes, it never returns wrong rows — so the
drain needs no knowledge of when the driver actually collected.

Callers that manage their own lifecycle (the GA loops, which unpersist
per generation) keep raw persist/unpersist and never touch this.
"""

from __future__ import annotations

import atexit
import contextlib
import logging

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []
_CLEANUPS: list = []
_TRUNC_DEPTH = 0
_log = logging.getLogger(__name__)


@contextlib.contextmanager
def truncated_persists():
    """While active, scoped_persist() checkpoint-truncates instead of
    caching (r14, guide §3.3/§5 "materialise intermediates to truncate
    enormous plans").

    Why: the composed curation ladders nest 4-6 persisted rungs, and a
    persist keeps the FULL logical plan behind its InMemoryRelation —
    so every downstream action re-analyzes the whole pyramid, and (the
    r14 jstack finding) AQE re-runs createQueryStages/transformUp over
    the giant tree once per materialized Exchange: the containment
    entry's one noop save spawned 58 AQE stage-jobs at a near-constant
    ~0.43 s of driver Catalyst time each, while total executor task
    time was only ~36 s spread over 105 stages. Collapsing each rung
    to a Scan ExistingRDD leaf makes every per-stage re-plan O(rung),
    not O(ladder) — the same mechanism as the r13 span-rung fix,
    applied to the whole ladder family. At 100 TB the driver cost is
    the same single-threaded Catalyst bottleneck, only with thousands
    of stages behind it — truncation is the production policy for
    deeply-composed pipelines, not a local-mode dodge.

    Standalone operators (shallow plans, one or two persists) keep
    plain persist: for them the truncation's eager materialization
    and lost cached-plan partitioning would cost more than the
    re-analysis they don't suffer. Reentrant (ladders compose)."""
    global _TRUNC_DEPTH
    _TRUNC_DEPTH += 1
    try:
        yield
    finally:
        _TRUNC_DEPTH -= 1


def scoped_cleanup(fn) -> None:
    """Register a cleanup callable (drop a temp table, rm a temp layout)
    to run when the NEXT catalog entry is built — the same lifecycle as
    scoped_persist, for entries that materialize a durable artifact
    (e.g. the bucket-stored generation) their returned DataFrame still
    reads from.  Deferring past the entry's own return keeps the result
    lazily computable for the driver's collect; running at next-entry
    build (or interpreter exit) bounds the leak to one artifact."""
    _CLEANUPS.append(fn)


def release_cleanups() -> int:
    n = 0
    while _CLEANUPS:
        fn = _CLEANUPS.pop()
        try:
            fn()
            n += 1
        except Exception as exc:
            _log.debug("release_cleanups: cleanup skipped (%s)", exc)
    return n


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release when the next catalog entry is
    built (or when release_persists() is called explicitly). Inside a
    truncated_persists() scope the frame is checkpoint-truncated to a
    plan leaf instead (same lifecycle, see truncated_persists)."""
    if _TRUNC_DEPTH > 0:
        out = local_checkpoint_truncated(df)
        scoped_cleanup(lambda: free_checkpoint(out))
        return out
    df.persist()
    _SCOPED.append(df)
    return df


def release_persists() -> int:
    """Unpersist every scoped handle; returns how many were released.

    Also runs at interpreter exit (r6 ADVICE: the LAST entry's scoped
    persists were only ever drained when a NEXT entry was built — a
    bounded but real end-of-session cache leak on single-entry runs)."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception as exc:
            # a stopped session invalidates handles; nothing to release,
            # but say so at debug level instead of swallowing silently
            _log.debug("release_persists: unpersist skipped (%s)", exc)
    return n


atexit.register(release_persists)
atexit.register(release_cleanups)


def local_checkpoint_truncated(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + FRESH leaf statistics — the iterative-loop
    lineage truncation that actually stays O(1) per iteration.

    ``Dataset.localCheckpoint`` truncates the plan to a LogicalRDD but
    PRESERVES the source plan's estimated statistics through it.  In a
    loop whose per-iteration plan contains joins, the size-only
    estimator multiplies child sizes (inner-join sizeInBytes = product
    of children), so the carried estimate COMPOUNDS: sizeInBytes's
    digit count doubles every iteration (measured on the r8 skinny SGA
    loop: 7 → 15 → 29 → … → 902 digits by generation 7), and every
    subsequent plan's stats pass multiplies those BigInts — wall time
    per generation triples from ~gen 18 regardless of data size (the
    40-generation 64-row repro hit 292 s/generation of pure
    driver-side BigInteger.multiply; r1-r7's join-free generation plan
    only ever ADDED stats, which masked the trap).

    The fix rebuilds the DataFrame over the checkpointed RDD with
    default leaf stats (sizeInBytes = spark.sql.defaultSizeInBytes):
    size-based planning inside ONE generation is unaffected — the
    loop's join sides that must broadcast are hinted, AQE re-plans on
    runtime sizes anyway — and the estimate no longer crosses
    iterations.  Uses SparkSession.internalCreateDataFrame (Scala
    package-private = JVM-public; stable across Spark 3.x/4.x — the
    same entry point PySpark's own createDataFrame path rides).

    Classic-sessions only (r8 ADVICE): the rebuild rides JVM-private
    plumbing that Spark Connect sessions don't expose — fail with a
    clear error rather than an AttributeError deep in py4j.  Two
    physical caveats of the rebuilt LogicalRDD: it drops the
    checkpointed plan's output PARTITIONING/ordering (downstream
    stages that relied on it re-exchange — the GA loop's next
    generation re-shuffles on a fresh seeded key anyway, so nothing is
    lost there; callers that need the partitioning should keep plain
    localCheckpoint), and leaf stats reset to
    spark.sql.defaultSizeInBytes (the point)."""
    if not hasattr(df.sparkSession, "_jsparkSession"):
        raise RuntimeError(
            "local_checkpoint_truncated requires a classic (JVM-local) "
            "SparkSession; Spark Connect sessions don't expose the "
            "internalCreateDataFrame rebuild path. Use "
            "df.localCheckpoint() and bound your loop's join-stats "
            "growth another way (e.g. write/read a generation store)."
        )
    ck = df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    jdf = ck._jdf
    jrdd = jdf.queryExecution().toRdd()
    new_jdf = spark._jsparkSession.internalCreateDataFrame(
        jrdd, jdf.schema(), False
    )
    out = DataFrame(new_jdf, spark)
    # keep a handle to the CHECKPOINTED RDD: DataFrame.unpersist() does
    # not free localCheckpoint blocks (they belong to the RDD, not the
    # cache manager), so a loop that rotates checkpointed state would
    # accumulate block storage for every superseded generation until
    # JVM GC + ContextCleaner get around to it (r8 ADVICE). Callers
    # rotate with free_checkpoint(old) instead.
    out._gamr_ck_jrdd = jrdd
    return out


def free_checkpoint(df: DataFrame) -> None:
    """Release a rotated local_checkpoint_truncated frame: explicitly
    unpersist the underlying checkpointed RDD's blocks (non-blocking),
    falling back to plain unpersist for ordinary cached frames.

    The handle captured at checkpoint time is a WRAPPER
    (SQLExecutionRDD → MapPartitionsRDD → the actually-persisted
    checkpoint RDD → LocalCheckpointRDD); unpersisting the wrapper
    frees nothing, so walk the (linear) lineage and unpersist every
    ancestor holding a valid storage level."""
    jrdd = getattr(df, "_gamr_ck_jrdd", None)
    try:
        if jrdd is None:
            df.unpersist()
            return
        r, depth = jrdd, 0
        while r is not None and depth < 16:
            if r.getStorageLevel().isValid():
                r.unpersist(False)
            deps = r.dependencies().iterator()
            r = deps.next().rdd() if deps.hasNext() else None
            depth += 1
    except Exception as exc:
        _log.debug("free_checkpoint: release skipped (%s)", exc)
