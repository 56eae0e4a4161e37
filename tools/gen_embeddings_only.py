"""Embeddings-only scale data: the r10 additions (IVF rebuild, append
compaction, residual PQ) read nothing but embeddings.parquet, so their
decade rows don't need the full 19 GB sf100 corpus regenerated — just
the 2M-vector table, byte-identical to what tools/gen_sf1.py would
write for it (same xxhash64 expressions, same BASE sizing).

Usage: python tools/gen_embeddings_only.py OUT_DIR MULT
  e.g. tools/gen_embeddings_only.py .localdata/sf10e 100
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402

BASE_EMB = 2_000  # sf0.1 embeddings rows, matching gen_sf1.BASE


def main() -> None:
    out, mult = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    spark = build_session("gamr-gen-emb")
    spark.sparkContext.setLogLevel("ERROR")
    n = BASE_EMB * mult
    (
        spark.range(n).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 63), j ->"
            " cast(((xxhash64(id, j, 'em') & 9223372036854775807)"
            " % 1155) / 1000.0 - 0.577 as float)) AS embedding",
            "cast((xxhash64(id, 'elb') & 9223372036854775807) % 10"
            " as int) AS label",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    print(f"done -> {out} ({n} vectors)")
    spark.stop()


if __name__ == "__main__":
    main()
