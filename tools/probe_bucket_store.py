"""Probe: bucket-stored generation -> zero-exchange genome join-back.

Compares the current sga_tournament shape (dedup-ids-then-derive lookup)
against the bucket-stored shape (genome lookup = bucketed parquet scan,
bucketed by id) at a given sf dir. Prints per-shape wall seconds, row
counts, and asserts the plan property: in the bucketed shape the genome
side reaches the join straight from the FileScan with NO Exchange.

    python tools/probe_bucket_store.py [sf_dir] [n_buckets] [runs]
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    selection as selection_ops,
    shuffle as shuffle_ops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.sources import bucketing  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = build_session(app="probe_bucket_store")
    out: dict = {"sf_dir": sf_dir, "n_buckets": n_buckets}

    def timed(tag, fn):
        best = None
        n = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[tag] = {"sec": round(best, 2), "rows": n}
        print(f"{tag}: {best:.2f}s rows={n}", flush=True)

    # --- current shape (registered entry) ---
    timed(
        "current",
        lambda: catalog.QUERIES["sga_tournament"](spark, sf_dir).count(),
    )

    # --- bucket-stored shape ---
    d = tempfile.mkdtemp(prefix="gen_store_")
    tbl = "probe_gen_store"
    try:
        t0 = time.perf_counter()
        g = catalog._pop_genomes_unique(spark, sf_dir)
        bucketing.write_bucketed(g, tbl, d, n_buckets, "id", sort=False)
        out["store_write_sec"] = round(time.perf_counter() - t0, 2)
        print(f"store write: {out['store_write_sec']}s", flush=True)

        def bucketed():
            store = bucketing.read_bucketed(spark, tbl)
            sh = shuffle_ops.with_shuffle_key(
                catalog._pop_with_fitness(spark, sf_dir),
                catalog.SEED * 1_000_033,
                n_buckets=32,
            )
            return selection_ops.tournament_parents(sh, genome_df=store)

        timed("bucketed_select", lambda: bucketed().count())
        out["bucketed_total_sec"] = round(
            out["store_write_sec"] + out["bucketed_select"]["sec"], 2
        )

        # plan property: genome-side FileScan of the store reaches the
        # join with no Exchange (and no exchange anywhere carrying genome)
        df = bucketed()
        p = df._jdf.queryExecution().executedPlan().toString()
        p = p.split("== Initial Plan ==")[0]
        blocks = re.split(r"\n(?=\(\d+\) |[+:]?- )", p)
        genome_exch = [
            b for b in blocks if "Exchange" in b.split("\n")[0]
            and "genome" in b
        ]
        out["genome_carrying_exchanges"] = len(genome_exch)
        print(f"genome-carrying exchanges: {len(genome_exch)}", flush=True)
        for b in genome_exch:
            print(b[:300], flush=True)

        # value parity with the current entry
        cur = catalog.QUERIES["sga_tournament"](spark, sf_dir)
        bk = df.withColumn("parent", catalog._gstr("parent"))
        diff = bk.exceptAll(cur).count() + cur.exceptAll(bk).count()
        out["diff_rows"] = diff
        print(f"diff rows vs current: {diff}", flush=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
