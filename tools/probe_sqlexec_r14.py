"""SQL-execution-level wall attribution via the UI REST API (r14): run
one catalog entry with the UI enabled, then list every SQL execution
(action) with its duration and submission gap — shows whether wall-clock
goes to task work or to the driver between jobs.

    python tools/probe_sqlexec_r14.py <entry> [sf_dir]
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
        "gamr-probe-sqlexec", extra_conf={"spark.ui.enabled": "true"}
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
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}{path}"
        ) as r:
            return json.load(r)

    sqls = get("/sql?length=1000")
    sqls.sort(key=lambda s: s["submissionTime"])
    print(f"entry wall {wall:.2f}s; {len(sqls)} SQL executions:")
    total_dur = 0
    for s in sqls:
        dur = s.get("duration", 0)
        total_dur += dur
        desc = (s.get("description") or "")[:60].replace("\n", " ")
        njobs = len(s.get("successJobIds", []))
        print(f"  id {s['id']:>4}  {dur:>7} ms  jobs {njobs:>2}  {desc}")
    print(f"sum of execution durations: {total_dur} ms (wall {wall*1000:.0f} ms)")
    spark.stop()


if __name__ == "__main__":
    main()
