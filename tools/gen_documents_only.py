"""Documents-only scale data: the text-family r10 addition (BM25) reads
nothing but documents.parquet, so its decade rows don't need the full
sf100 corpus regenerated — just the Zipf-token document table,
byte-identical to tools/gen_sf1.py's documents block (same xxhash64
streams, same inverse-CDF Zipf draw, same BASE sizing).

Usage: python tools/gen_documents_only.py OUT_DIR MULT
  e.g. tools/gen_documents_only.py .localdata/sf10d 100
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from tools.gen_sf1 import BASE, VOCAB, h, pick  # noqa: E402


def main() -> None:
    out, mult = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    spark = build_session("gamr-gen-docs")
    spark.sparkContext.setLogLevel("ERROR")
    n = BASE["documents"] * mult

    vocab_arr = "array(" + ", ".join(f"'{w}'" for w in VOCAB[:30]) + ")"
    zipf_v = 10_000
    zipf_rank = (
        "cast(pow(" + f"{zipf_v}.0D, "
        "((xxhash64(id, i, 'dw') & 9223372036854775807)"
        " / 9.223372036854775807e18)) as int)"
    )
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "concat(concat_ws(' ', transform("
        f"sequence(1, cast({h('dn', 'id')} % 91 + 10 as int)),"
        f"i -> CASE WHEN {zipf_rank} <= 30"
        f" THEN element_at({vocab_arr}, {zipf_rank})"
        f" ELSE concat('w', {zipf_rank}) END)),"
        " CASE WHEN id % 20 = 0 THEN ' dup' ELSE '' END) AS text",
        pick(["en", "en", "en", "en", "de", "es", "fr", "zh"],
             h("dl", "id")) + " AS lang",
        f"concat('src', cast({h('ds', 'id')} % 20 as string)) AS source",
    ).selectExpr(
        "doc_id", "text", "lang", "source",
        "cast(length(text) as bigint) AS n_chars",
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"done -> {out} ({n} documents)")
    spark.stop()


if __name__ == "__main__":
    main()
