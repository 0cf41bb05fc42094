"""Multimodal columns — array/map/struct handling + opaque binary payloads.

North-star shape: image/audio/video ride through the engine as opaque
``binary`` columns with typed metadata structs; decode/feature-extract
runs as Arrow-batched pandas functions over ``mapInPandas``.

The decode compute is REAL for uncompressed formats, pure Python + numpy
(nothing beyond the stdlib to parse): PPM (P6) images, RIFF/WAVE 16-bit
PCM audio, and a minimal length-prefixed PPM frame container ("FRV1")
for video. Compressed formats (JPEG/FLAC/H.264) would slot into the SAME
mapInPandas bodies via PIL/soundfile/pyav — only the per-batch decode
call changes, none of the Spark plumbing (schema, batching, partitioning)
does. `make_media_real` synthesizes genuine binaries of these formats
from the documents table so the operators decode real bytes end-to-end;
`make_media` keeps the utf-8 text payloads whose md5/length the
DuckDB oracles of `multimodal_dedup`/`multimodal_meta_agg` can mirror.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectorfns import as_double, dot, norm
from ..plans.registry import query
from ..sources import load_table, spread

# ---------------------------------------------------------------------------
# Pure-Python codecs (real compute, no external libs)
# ---------------------------------------------------------------------------


def _pixels(n: int, seed: int):
    """Deterministic pixel/sample ramp: byte j = (seed*31 + j*7) % 256.
    Pure arithmetic — a retried task regenerates identical payloads."""
    import numpy as np

    j = np.arange(n, dtype=np.int64)
    return ((seed * 31 + j * 7) % 256).astype(np.uint8)


def encode_ppm_from_array(img) -> bytes:
    """Serialize an HxWx3 uint8 array as binary PPM (P6): ASCII header,
    raw RGB24 raster. SINGLE owner of the header format — encode_ppm and
    the resize kernel both delegate here so a header change can't drift
    between producer sites."""
    h, w = img.shape[0], img.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_ppm(width: int, height: int, seed: int) -> bytes:
    """A genuine binary PPM (P6) with deterministic pseudo-pixels."""
    return encode_ppm_from_array(
        _pixels(width * height * 3, seed).reshape(height, width, 3)
    )


def decode_ppm(buf: bytes):
    """Parse P6 PPM -> (width, height, HxWx3 uint8 array). Real parser:
    honors arbitrary whitespace and '#' comments in the header per spec."""
    import numpy as np

    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(buf, dtype=np.uint8, count=width * height * 3, offset=pos)
    return width, height, raster.reshape(height, width, 3)


def encode_wav(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """A genuine RIFF/WAVE file: fmt chunk + 16-bit PCM mono data."""
    import numpy as np

    samples = (
        _pixels(n_samples, seed).astype(np.int16) * 128 - 16384
    )  # full-ish int16 swing, deterministic
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(buf: bytes):
    """Parse RIFF/WAVE -> (sample_rate, int16 numpy array). Walks the
    chunk list properly (fmt/data may be preceded by LIST etc.)."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            rate = struct.unpack("<HHIIHH", body[:16])[2]
        elif cid == b"data":
            data = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def encode_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Minimal video container 'FRV1': magic + u32 frame count, then each
    frame as u32 length + a PPM payload (seed varies per frame)."""
    out = [b"FRV1", struct.pack("<I", n_frames)]
    for f in range(n_frames):
        frame = encode_ppm(width, height, seed + f * 101)
        out.append(struct.pack("<I", len(frame)))
        out.append(frame)
    return b"".join(out)


def iter_video_frames(buf: bytes):
    """Parse FRV1 -> yields (frame_idx, ppm_bytes) without materializing
    all frames (frame-sampling skips payload decode of dropped frames)."""
    if buf[:4] != b"FRV1":
        raise ValueError("not an FRV1 container")
    (n_frames,) = struct.unpack("<I", buf[4:8])
    pos = 8
    for idx in range(n_frames):
        (flen,) = struct.unpack("<I", buf[pos : pos + 4])
        yield idx, buf[pos + 4 : pos + 4 + flen]
        pos += 4 + flen


def video_frame_count(buf: bytes) -> int:
    if buf[:4] != b"FRV1":
        raise ValueError("not an FRV1 container")
    return struct.unpack("<I", buf[4:8])[0]


def resize_nearest(img, tw: int, th: int):
    """Nearest-neighbor resize via integer index mapping — the
    deterministic numpy kernel (PIL-free); a real build swaps in
    PIL/torchvision antialiased resize on the same batch loop."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[ys][:, xs]


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


def _media_geometry(media_id: int, kind: str) -> tuple:
    """Deterministic synth geometry per asset (pure arithmetic — retried
    tasks regenerate identical payloads)."""
    if kind == "image":
        return (16 + media_id % 17, 16 + (media_id // 7) % 13)
    if kind == "audio":
        return (8000 + (media_id % 8) * 1000, 256 + media_id % 512)
    return (8, 8, 1 + media_id % 72)  # video: w, h, n_frames


def make_media_real(docs: DataFrame) -> DataFrame:
    """Media table with GENUINE binary payloads — PPM images, RIFF/WAVE
    audio, FRV1 video — synthesized deterministically per doc_id by a
    mapInPandas source adapter (the stand-in for reading real assets from
    object storage; the decode operators downstream parse actual bytes
    either way). Pure map, no shuffle."""
    import pandas as pd

    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, kind in zip(pdf["media_id"], pdf["kind"]):
                mid = int(mid)
                if kind == "image":
                    w, h = _media_geometry(mid, kind)
                    payloads.append(encode_ppm(w, h, mid))
                elif kind == "audio":
                    rate, n = _media_geometry(mid, kind)
                    payloads.append(encode_wav(rate, n, mid))
                else:
                    w, h, nf = _media_geometry(mid, kind)
                    payloads.append(encode_video(w, h, nf, mid))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                }
            )

    return base.mapInPandas(synth, "media_id long, kind string, payload binary")


@query("multimodal_decode")  # rows-only: the pandas-UDF decode surface
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract via mapInPandas: one Arrow batch of
    (media_id, kind, payload) in, one batch of typed metadata + pixel
    stats out. The decode is REAL — PPM header parse + raster stats, WAV
    chunk walk + amplitude stats, FRV1 frame count + first-frame stats —
    so ``content_mean`` is a verifiable property of the bytes (pinned by
    tests against an independent pure-Python recompute). The batch loop
    is where a compressed-format build vectorizes (torchvision
    decode_jpeg over the batch). Pure map — scales linearly, no shuffle;
    partition sizing is controlled upstream by
    spark.sql.files.maxPartitionBytes."""
    import pandas as pd

    media = make_media_real(spread(load_table(spark, "documents", sf_dir)))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                if kind == "image":
                    w, h, img = decode_ppm(payload)
                    meta = (w, h, None, 1, round(float(img.mean()), 4))
                elif kind == "audio":
                    rate, samples = decode_wav(payload)
                    meta = (
                        None,
                        None,
                        rate,
                        len(samples),
                        round(float(abs(samples.astype("int64")).mean()), 4),
                    )
                else:
                    nf = video_frame_count(payload)
                    _, first = next(iter_video_frames(payload))
                    w, h, img = decode_ppm(first)
                    meta = (w, h, None, nf, round(float(img.mean()), 4))
                rows.append((int(mid), kind, *meta, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "sample_rate", "n_frames", "content_mean", "payload_bytes",
                ],
            )

    return media.mapInPandas(
        decode_batches,
        "media_id long, kind string, width int, height int, "
        "sample_rate int, n_frames int, content_mean double, payload_bytes long",
    )


FRAME_SAMPLE_EVERY = 24  # keep one frame in 24 (~1 fps at 24 fps video)


@query("multimodal_frame_sample")  # rows-only: pandas-UDF 1->N surface
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling via mapInPandas — the 1->N batch shape: each
    video row explodes into one row per sampled frame (every
    {FRAME_SAMPLE_EVERY}th). The container walk is REAL: FRV1 frames are
    length-prefixed, so skipped frames are seeked over without decoding
    (the same reason production samplers read container indexes instead
    of decoding every frame); each KEPT frame is PPM-decoded for its
    pixel mean. Output cardinality is data-dependent, which is exactly
    what mapInPandas allows and a pandas_udf (1:1) does not.

    Scale: pure map over payload partitions; downstream training-shard
    writes repartition by hash(media_id, frame_idx) to spread hot videos.
    """
    import pandas as pd

    media = make_media_real(spread(load_table(spark, "documents", sf_dir))).filter(
        F.col("kind") == "video"
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                nf = video_frame_count(payload)
                for idx, frame in iter_video_frames(payload):
                    if idx % FRAME_SAMPLE_EVERY:
                        continue
                    _, _, img = decode_ppm(frame)
                    out.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "n_frames": nf,
                            "frame_mean": round(float(img.mean()), 4),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_frames", "frame_mean"]
            )

    return media.mapInPandas(
        sample_batches,
        "media_id long, frame_idx int, n_frames int, frame_mean double",
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
    payload->payload). The compute is REAL: PPM decode, nearest-neighbor
    numpy resize to {RESIZE_TARGET}, PPM re-encode — ``resized_bytes``
    is the actual re-encoded length and ``dst_mean`` an actual raster
    statistic (pinned by tests against an independent recompute).
    Antialiased/letterboxed variants swap the numpy kernel for
    PIL/torchvision inside this same function — the Spark plumbing
    doesn't change."""
    import pandas as pd

    media = make_media_real(spread(load_table(spark, "documents", sf_dir))).filter(
        F.col("kind") == "image"
    )
    tw, th = RESIZE_TARGET

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, img = decode_ppm(bytes(payload))
                resized = resize_nearest(img, tw, th)
                out_ppm = encode_ppm_from_array(resized)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "src_width": w,
                        "src_height": h,
                        "dst_width": tw,
                        "dst_height": th,
                        "src_mean": round(float(img.mean()), 4),
                        "dst_mean": round(float(resized.mean()), 4),
                        "resized_bytes": len(out_ppm),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height", "dst_width",
                    "dst_height", "src_mean", "dst_mean", "resized_bytes",
                ],
            )

    return media.mapInPandas(
        resize_batches,
        "media_id long, src_width int, src_height int, dst_width int, "
        "dst_height int, src_mean double, dst_mean double, resized_bytes long",
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
