"""Documents-only scale data: the text-family r10 addition (BM25) reads
nothing but documents.parquet, so its decade rows don't need the full
sf100 corpus regenerated — just the Zipf document table, byte-identical
to tools/gen_sf1.py's documents block (shared documents_frame: same
xxhash64 streams, same inverse-CDF Zipf draw, same organic-boilerplate
splice, same BASE sizing).

Usage: python tools/gen_documents_only.py OUT_DIR MULT
  e.g. tools/gen_documents_only.py .localdata/sf10d 100
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from tools.gen_sf1 import BASE, documents_frame  # noqa: E402


def main() -> None:
    out, mult = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    spark = build_session("gamr-gen-docs")
    spark.sparkContext.setLogLevel("ERROR")
    n = BASE["documents"] * mult
    docs = documents_frame(spark, n)
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"done -> {out} ({n} documents)")
    spark.stop()


if __name__ == "__main__":
    main()
