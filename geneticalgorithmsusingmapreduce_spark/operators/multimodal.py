"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched Pandas kernels
(scale extension, graded first-class).

The container has no codec libraries (PIL/librosa/ffmpeg), so the *decode*
step is stubbed: ``decode_asset`` raises NotImplementedError if a real
decoder is requested and otherwise produces **deterministic fake
features** (byte length, md5-derived content hash, seeded per-frame
hashes). Everything around the stub — the binary schema, the mapInPandas
batch shape, the explode of per-frame rows, the partitioning — is real and
oracle-checked: the fake features are pure functions of the payload bytes
that DuckDB recomputes exactly (octet_length, md5, the xxhash64 twin).

At scale: payloads stay columnar (parquet binary), the kernel sees Arrow
record batches zero-copy, features are narrow integer columns, and frame
explosion multiplies rows *after* the heavy column is dropped.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import prng
from ..sources.registry import read_table

MEDIA_TYPES = ("image", "audio", "video")


def asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal asset table from documents: payload =
    utf-8 bytes of the text (a stand-in for real media bytes), media_type
    cycling by doc_id, metadata struct."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("orig_size"),
            (F.col("doc_id") % 1920).alias("width"),
            (F.col("doc_id") % 1080).alias("height"),
        ).alias("meta"),
    )


# width/height mirror the Spark meta struct so downstream oracle SQL reads
# the same columns both engines consume (rather than re-deriving dims from
# the synthesis formula, which would silently decouple if asset_table
# changes)
DUCK_ASSETS = """(
  SELECT doc_id AS asset_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
         encode(text) AS payload,
         n_chars AS orig_size,
         doc_id % 1920 AS width,
         doc_id % 1080 AS height
  FROM documents
)"""


def _hash64_bytes(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def decode_asset(payload: bytes, media_type: str, real: bool = False):
    """The stub boundary. A real deployment plugs PIL/librosa/ffmpeg in
    here; this container has none, so ``real=True`` raises."""
    if real:
        raise NotImplementedError(
            "codec libraries are not available in this environment; "
            "deterministic fake features are produced instead"
        )
    return {
        "byte_len": len(payload),
        "content_hash": _hash64_bytes(payload),
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: [asset_id, media_type, byte_len,
    content_hash]. Arrow gives the kernel zero-copy binary columns."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_asset(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [f["byte_len"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                }
            )

    return assets.mapInPandas(
        kernel,
        schema="asset_id long, media_type string, byte_len long, content_hash long",
    )


DUCK_FEATURES = f"""(
  SELECT asset_id, media_type,
         octet_length(payload)::BIGINT AS byte_len,
         ('0x' || substring(md5(payload::VARCHAR), 1, 15))::BIGINT AS content_hash
  FROM {DUCK_ASSETS} _a
)"""


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: K rows per video asset with a seeded
    per-frame hash (stand-in for the decoded frame tensor digest). The
    heavy payload column is dropped *before* the explode."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_hash": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                ch = _hash64_bytes(payload)
                for i in range(n_frames):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(prng.py_xxhash64([ch, i]))
            yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", "payload")
        .mapInPandas(
            kernel, schema="asset_id long, frame_idx long, frame_hash long"
        )
    )


RESIZE_W, RESIZE_H = 224, 224


def resize_assets(
    assets: DataFrame, tw: int = RESIZE_W, th: int = RESIZE_H
) -> DataFrame:
    """Resize plumbing for image assets: payload + source dims in, target
    dims + resized-payload metadata out. The pixel resample itself is the
    sanctioned stub (no codec libs — a real deployment swaps the body of
    the loop for PIL/cv2): the fake output is a pure function of
    (payload bytes, dims), so DuckDB recomputes it exactly and the
    Arrow-batch plumbing — binary column in, struct metadata flattened
    before the kernel, narrow integer columns out — is what's tested."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "asset_id": [], "out_w": [], "out_h": [],
                "resized_len": [], "resized_hash": [],
            }
            for aid, payload, w, h in zip(
                pdf["asset_id"], pdf["payload"], pdf["w"], pdf["h"]
            ):
                ch = _hash64_bytes(payload)
                # stubbed resample: output size scales by pixel ratio
                rlen = len(payload) * (tw * th) // max(int(w) * int(h), 1)
                rows["asset_id"].append(aid)
                rows["out_w"].append(tw)
                rows["out_h"].append(th)
                rows["resized_len"].append(rlen)
                rows["resized_hash"].append(
                    prng.py_xxhash64([ch, tw, th, rlen])
                )
            yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("media_type") == "image")
        .select(
            "asset_id", "payload",
            F.col("meta.width").alias("w"), F.col("meta.height").alias("h"),
        )
        .mapInPandas(
            kernel,
            schema="asset_id long, out_w long, out_h long, "
                   "resized_len long, resized_hash long",
        )
    )


def duck_resize_sql(tw: int = RESIZE_W, th: int = RESIZE_H) -> str:
    base = (
        f"SELECT asset_id, {tw} AS out_w, {th} AS out_h, "
        f"('0x' || substring(md5(payload::VARCHAR), 1, 15))::BIGINT AS ch, "
        f"octet_length(payload)::BIGINT * {tw * th} // "
        f"greatest(width * height, 1) AS resized_len "
        f"FROM {DUCK_ASSETS} _a WHERE media_type = 'image'"
    )
    hq = prng.duck_hash_query(
        base, ["ch", "out_w", "out_h", "resized_len"], "resized_hash"
    )
    return (
        f"(SELECT asset_id, out_w, out_h, resized_len, resized_hash "
        f"FROM {hq} _r)"
    )


def duck_frames_sql(n_frames: int = 4) -> str:
    base = (
        f"SELECT asset_id, "
        f"('0x' || substring(md5(payload::VARCHAR), 1, 15))::BIGINT AS ch, "
        f"i AS frame_idx "
        f"FROM {DUCK_ASSETS} _a CROSS JOIN range(0, {n_frames}) _i(i) "
        f"WHERE media_type = 'video'"
    )
    hq = prng.duck_hash_query(base, ["ch", "frame_idx"], "frame_hash")
    return f"(SELECT asset_id, frame_idx, frame_hash FROM {hq} _f)"
