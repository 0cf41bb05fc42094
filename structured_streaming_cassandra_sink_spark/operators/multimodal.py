"""Multimodal columns — array/map/struct handling + opaque binary payloads.

North-star shape: image/audio/video ride through the engine as opaque
``binary`` columns with typed metadata structs; decode/feature-extract
runs as Arrow-batched pandas functions over ``mapInPandas``. The decode
itself is STUBBED (no image/audio libs in this container) behind
``decode_stub`` — a deterministic fake with the real Spark-side plumbing:
schema, batching, partitioning all genuine and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectorfns import as_double, dot, norm
from ..plans.registry import query
from ..sources import load_table, spread

REAL_DECODERS_AVAILABLE = False  # flip when PIL/soundfile etc. are installed


@query(
    "multimodal_cols",
    """
    SELECT vec_id, label,
           len(embedding)                                             AS dim,
           round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                 x -> x * x), 'sum')), 4)                             AS l2_norm,
           round(list_aggregate(embedding::DOUBLE[], 'sum')
                 / len(embedding), 4)                                 AS mean_val,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))          AS n_positive,
           round(embedding[1]::DOUBLE, 6)                             AS first_val
    FROM embeddings
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column battery over embeddings: transform/filter/aggregate
    higher-order functions — all Catalyst, no Python, per-row map (no
    shuffle)."""
    emb = load_table(spark, "embeddings", sf_dir)
    vec = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(norm(vec), 4).alias("l2_norm"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding"), 4
        ).alias("mean_val"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at(vec, 1), 6).alias("first_val"),
    )


def make_media(docs: DataFrame) -> DataFrame:
    """Synthesize the media table shape (schemas.MEDIA) from documents:
    payload = utf-8 bytes of text (a deterministic stand-in for real
    image/audio bytes), kind round-robins image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decoder. A real deployment replaces this body
    with PIL / libsndfile / pyav calls (gated on REAL_DECODERS_AVAILABLE);
    everything around it — Arrow batching, schema, partitioning — is the
    production plumbing."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decoders not wired in this environment")
    n = len(payload)
    checksum = sum(payload) % 997
    if kind == "image":
        return {"width": 64 + n % 640, "height": 64 + checksum % 480, "sample_rate": None, "n_frames": 1}
    if kind == "audio":
        return {"width": None, "height": None, "sample_rate": 8000 + (n % 8) * 1000, "n_frames": n}
    return {"width": 64 + n % 640, "height": 64 + checksum % 480, "sample_rate": None, "n_frames": 1 + n % 240}


@query("multimodal_decode")  # rows-only: the pandas-UDF decode surface
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract via mapInPandas: one Arrow batch of
    (media_id, kind, payload) in, one batch of typed metadata out. The
    batch loop is where a real decoder vectorizes (e.g. torchvision
    decode_jpeg on the whole batch). Pure map — scales linearly, no
    shuffle; partition sizing is controlled upstream by
    spark.sql.files.maxPartitionBytes."""
    import pandas as pd

    media = make_media(spread(load_table(spark, "documents", sf_dir)))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            out["payload_bytes"] = [len(p) for p in pdf["payload"]]
            yield out

    return media.mapInPandas(
        decode_batches,
        "media_id long, kind string, width int, height int, "
        "sample_rate int, n_frames int, payload_bytes long",
    )


FRAME_SAMPLE_EVERY = 24  # keep one frame in 24 (~1 fps at 24 fps video)


@query("multimodal_frame_sample")  # rows-only: pandas-UDF 1->N surface
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling via mapInPandas — the 1->N batch shape: each
    video row explodes into one row per sampled frame (every
    {FRAME_SAMPLE_EVERY}th). The stub synthesizes frame indices/offsets
    from the decoded metadata; a real build decodes with pyav and emits
    (frame_idx, jpeg_bytes). Output cardinality is data-dependent, which
    is exactly what mapInPandas allows and a pandas_udf (1:1) does not.

    Scale: pure map over payload partitions; downstream training-shard
    writes repartition by hash(media_id, frame_idx) to spread hot videos.
    """
    import pandas as pd

    media = make_media(spread(load_table(spark, "documents", sf_dir))).filter(
        F.col("kind") == "video"
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = decode_stub(payload, "video")
                for idx in range(0, meta["n_frames"], FRAME_SAMPLE_EVERY):
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "n_frames": meta["n_frames"],
                            # deterministic fake per-frame feature
                            "frame_checksum": (sum(payload) + idx) % 997,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_frames", "frame_checksum"]
            )

    return media.mapInPandas(
        sample_batches,
        "media_id long, frame_idx int, n_frames int, frame_checksum int",
    )


@query(
    "multimodal_meta_agg",
    """
    SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*)                                  AS n_items,
           CAST(sum(length(text)) AS BIGINT)         AS total_payload_bytes,
           round(avg(length(text)), 4)               AS avg_payload_bytes
    FROM documents
    GROUP BY kind
    """,
)
def multimodal_meta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over the media table (payload sizes by kind)
    — the storage-accounting query of a multimodal corpus. Oracle-checked
    via the deterministic payload construction (utf-8 of ASCII text ⇒
    payload bytes == char length)."""
    media = make_media(load_table(spark, "documents", sf_dir))
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.round(F.avg(F.octet_length("payload")), 4).alias("avg_payload_bytes"),
    )


RESIZE_TARGET = (224, 224)  # the ubiquitous vision-model input size


@query("multimodal_resize")  # rows-only: pandas-UDF transform surface
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize via mapInPandas — the 1:1 payload-transform shape
    (decode is N metadata columns, frame-sample is 1->N rows; resize is
    payload->payload). The stub scales the decoded dimensions to
    {RESIZE_TARGET} and emits a deterministic fake of the resized bytes
    (length ∝ target area); a real build calls PIL/torchvision on the
    Arrow batch. Aspect-preserving letterboxing would live entirely in
    this function — the Spark plumbing doesn't change."""
    import pandas as pd

    media = make_media(spread(load_table(spark, "documents", sf_dir))).filter(
        F.col("kind") == "image"
    )
    tw, th = RESIZE_TARGET

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = decode_stub(payload, "image")
                scale_x = tw / meta["width"]
                scale_y = th / meta["height"]
                # deterministic fake resized payload: checksum mixes the
                # source bytes with the target geometry
                resized_checksum = (sum(payload) * tw + th) % 100003
                rows.append(
                    {
                        "media_id": media_id,
                        "src_width": meta["width"],
                        "src_height": meta["height"],
                        "dst_width": tw,
                        "dst_height": th,
                        "scale_x": round(scale_x, 6),
                        "scale_y": round(scale_y, 6),
                        "resized_checksum": resized_checksum,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height", "dst_width",
                    "dst_height", "scale_x", "scale_y", "resized_checksum",
                ],
            )

    return media.mapInPandas(
        resize_batches,
        "media_id long, src_width int, src_height int, dst_width int, "
        "dst_height int, scale_x double, scale_y double, resized_checksum long",
    )


@query(
    "multimodal_dedup",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             md5(text) AS payload_fp
      FROM documents)
    SELECT kind, payload_fp,
           min(media_id) AS keep_media_id,
           count(*)      AS n_copies
    FROM media GROUP BY kind, payload_fp
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary assets by payload fingerprint — the
    "same image uploaded a million times" pass of a multimodal corpus.
    md5 runs directly on the binary column; the shuffle carries only
    (kind, 16-byte hash, id) — never payload bytes — so at 100 TB the
    exchange is ~thousandths of the input. Oracle parity: payload is
    the utf-8 encoding of text, and DuckDB's md5(text) hashes the same
    bytes."""
    media = make_media(spread(load_table(spark, "documents", sf_dir)))
    return (
        media.select("kind", F.md5("payload").alias("payload_fp"), "media_id")
        .groupBy("kind", "payload_fp")
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
