"""Per-operator attribution via the Spark UI REST API (r14): run one
catalog entry with the UI enabled, then dump every SQL execution's
operator nodes with their metrics (the SQL-tab view, machine-readable).

    python tools/probe_sqlui_r14.py <entry> [sf_dir]

Prints the slowest nodes across all executions to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = build_session(
        "gamr-probe-sqlui", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    catalog.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    # stage-level attribution: executorRunTime (total task cpu-wall) per stage
    stages = get("/stages?status=complete")
    rows = []
    for s in stages:
        rows.append((
            s["executorRunTime"], s["stageId"], s["numCompleteTasks"],
            s["name"].split("\n")[0][:80],
        ))
    rows.sort(reverse=True)
    print(f"entry wall {wall:.2f}s; top stages by executorRunTime (ms):")
    for rt, sid, nt, nm in rows[:25]:
        print(f"  {rt:>8} ms  stage {sid:>5}  tasks {nt:>3}  {nm}")
    total_rt = sum(r[0] for r in rows)
    print(f"total executorRunTime {total_rt} ms across {len(rows)} stages")
    spark.stop()


if __name__ == "__main__":
    main()
