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
import logging

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []
_log = logging.getLogger(__name__)


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release when the next catalog entry is
    built (or when release_persists() is called explicitly)."""
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
