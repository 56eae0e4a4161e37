"""Custom stateful streaming operator (applyInPandasWithState).

The reference's driver folds per-task maxima into a running global best
each generation via HDFS side files (A2/S5, ``reference
src/edu/illinois/ga/MapReduce.java:387-427``). Under Structured
Streaming that fold is a keyed stateful operator: the running best lives
in the state store, each micro-batch updates it from the batch's rows,
and the operator emits the refreshed running best per key. This is the
idiomatic successor of writing a stateful Reducer class — used here for
the one aggregation shape Spark's built-in streaming aggs cannot express
directly as-needed (argmax payload + deterministic tie-break + custom
emit cadence) and as the engine's demonstration of the
applyInPandasWithState escape hatch.

Scale shape: state is O(1) per key (three int64s), batches arrive
pre-partitioned by the state key's exchange, and the per-batch work is a
vectorized pandas argmax — no per-row Python, no state growth with
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("best_fitness", LongType()),
    StructField("best_id", LongType()),
    StructField("rows_seen", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("run_id", LongType()),
    StructField("best_fitness", LongType()),
    StructField("best_id", LongType()),
    StructField("rows_seen", LongType()),
])


def _fold(key, pdf_iter, state: GroupState):
    """Per-key fold: running (best_fitness, best_id ties-to-min, rows)."""
    import pandas as pd

    if state.exists:
        best_fit, best_id, seen = state.get
    else:
        best_fit, best_id, seen = -1, -1, 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        seen += len(pdf)
        m = int(pdf["fitness"].max())
        mid = int(pdf.loc[pdf["fitness"] == m, "id"].min())
        if m > best_fit or (m == best_fit and mid < best_id):
            best_fit, best_id = m, mid
    state.update((best_fit, best_id, seen))
    yield pd.DataFrame(
        {
            "run_id": [key[0]],
            "best_fitness": [best_fit],
            "best_id": [best_id],
            "rows_seen": [seen],
        }
    )


def running_best_stream(pop_stream: DataFrame) -> DataFrame:
    """[run_id, id, fitness] stream → one refreshed running-best row per
    key per micro-batch (update mode)."""
    return (
        pop_stream.select("run_id", "id", "fitness")
        .groupBy("run_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
