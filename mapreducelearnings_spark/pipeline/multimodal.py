"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as
opaque ``binary`` payloads + typed metadata structs, with Arrow-batched
Pandas-UDF decode hooks.

Design for 100 TB: payloads stay binary columns in Parquet (or pointer
structs — URI + offset + length — when blobs live out-of-table in object
storage); metadata is a first-class struct column so filters on
mime/size/dims push down WITHOUT touching bytes; decode/feature-extract
runs in ``mapInPandas`` so bytes move driver-free through Arrow batches.

Decode is REAL for uncompressed raster payloads (PPM P6 / 24-bit BMP —
``pipeline.imagecodec``, pure numpy, no external library) and remains
honestly STUBBED for compressed formats: JPEG/PNG need PIL/cv2, absent
from this container, so ``decode_image_batch(fake=False)`` raises
NotImplementedError the moment a non-raster payload appears.
``fake=True`` keeps the deterministic byte-histogram stand-in for
arbitrary payloads — the Spark-side plumbing (schema, batch iteration,
partition shape) is identical on every path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake multimodal table: payload = UTF-8 bytes of the
    text column, metadata derived from the payload. In production the
    payload column is the raw media blob; everything downstream is
    identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_image_batch(
    payloads: pd.Series, fake: bool = False
) -> list[list[float]]:
    """Decode a batch of image payloads to feature rows.

    ``fake=False`` REALLY decodes uncompressed rasters (PPM P6 / 24-bit
    BMP via :mod:`.imagecodec`) to ``[height, width, mean_R, mean_G,
    mean_B]``; a compressed/unknown payload raises NotImplementedError
    (JPEG/PNG need PIL/cv2, absent from this container — the gate is
    now per-payload, not unconditional). ``fake=True`` is the
    format-agnostic byte-histogram stand-in."""
    if not fake:
        from . import imagecodec as IC

        return [
            IC.image_features(IC.decode_image(blob))
            for blob in payloads
        ]
    out = []
    for blob in payloads:
        hist = [0.0] * 8
        for byte in blob:
            hist[byte & 7] += 1.0
        total = sum(hist) or 1.0
        out.append([h / total for h in hist])
    return out


def extract_features(multimodal: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over payload batches — the real
    scale plumbing: Arrow batches in, Arrow batches out, no
    row-at-a-time Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["payload"], fake=fake)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return multimodal.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FRAME_BYTES = 64


def sample_frames(
    multimodal: DataFrame,
    every: int = 4,
    frame_bytes: int = FRAME_BYTES,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video-ish payloads: keep every ``every``-th
    frame of each payload, exploding one row per kept frame — the
    pre-processing step that turns a video corpus into an image corpus
    for feature extraction. ``fake=False`` REALLY demuxes uncompressed
    YUV4MPEG2 (Y4M) streams (:mod:`.avcodec` — header parse + FRAME
    splits, planes kept opaque exactly like a real demuxer); compressed
    containers (MP4/MKV/...) raise NotImplementedError per payload
    (ffmpeg/av territory). ``fake=True`` treats the payload as raw
    concatenated ``frame_bytes``-sized frames. Either way the scale
    plumbing is identical: Arrow batches in, a row-EXPANDING
    mapInPandas out (one input row → many frame rows), no driver
    involvement, output partitioning inherited from the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from . import avcodec as AV

            for pdf in batches:
                ids, idxs, frames = [], [], []
                for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                    blob = bytes(blob)
                    if not blob.startswith(AV.Y4M_MAGIC):
                        raise NotImplementedError(
                            "compressed video demux requires ffmpeg/av; "
                            "only uncompressed YUV4MPEG2 payloads decode "
                            "in-container"
                        )
                    all_frames, _ = AV.decode_y4m(blob)
                    for i in range(0, len(all_frames), every):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(all_frames[i])
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "frame_idx": idxs,
                        "frame": frames,
                        "n_bytes": [len(f) for f in frames],
                    }
                )
            return
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                n = -(-len(blob) // frame_bytes) if blob else 0
                for i in range(0, n, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(blob[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return multimodal.mapInPandas(run, schema=FRAME_SCHEMA)


THUMB_BYTES = 32


THUMB_SIDE = 8


def resize_images(
    multimodal: DataFrame,
    thumb_bytes: int = THUMB_BYTES,
    fake: bool = True,
    thumb_side: int = THUMB_SIDE,
) -> DataFrame:
    """Image resize/thumbnail stage. ``fake=False`` REALLY resizes
    uncompressed rasters: decode (PPM/BMP via :mod:`.imagecodec`) →
    nearest-neighbor resample to ``thumb_side``² → re-encode PPM; a
    compressed payload raises NotImplementedError (PIL/cv2 territory).
    ``fake=True`` keeps the format-agnostic truncate/pad stand-in.
    Either way the Spark-side plumbing is identical: Arrow batches
    through mapInPandas, 1→1 rows, output schema carries the thumb
    alongside refreshed metadata, partitioning inherited. The shape
    every per-item media transform (resize, re-encode, crop) shares at
    100 TB — payload-linear, shuffle-free."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from . import imagecodec as IC

            for pdf in batches:
                thumbs = [
                    IC.encode_ppm(
                        IC.resize_nearest(
                            IC.decode_image(b), thumb_side, thumb_side
                        )
                    )
                    for b in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "thumb": thumbs,
                        "n_bytes": [len(t) for t in thumbs],
                    }
                )
            return
        for pdf in batches:
            thumbs = [
                bytes(b)[:thumb_bytes].ljust(thumb_bytes, b"\0")
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "n_bytes": [len(t) for t in thumbs],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return multimodal.mapInPandas(run, schema=schema)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_audio_features(
    multimodal: DataFrame, fake: bool = True
) -> DataFrame:
    """Audio feature extraction over payload batches — the third
    modality, same mapInPandas shape as images. ``fake=False`` REALLY
    decodes RIFF WAV PCM-16 payloads (:mod:`.avcodec`) to
    ``[n_samples, channels, rate, peak, rms]``; compressed audio
    (MP3/AAC — WAV with a non-PCM format tag, or a non-RIFF container)
    raises NotImplementedError per payload. ``fake=True`` emits the
    byte-count + first/last-byte stand-in for arbitrary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import avcodec as AV

        for pdf in batches:
            feats = []
            for blob in pdf["payload"]:
                blob = bytes(blob)
                if fake:
                    feats.append(
                        [
                            float(len(blob)),
                            float(blob[0]) if blob else 0.0,
                            float(blob[-1]) if blob else 0.0,
                        ]
                    )
                else:
                    if blob[:4] != AV.WAV_MAGIC:
                        raise NotImplementedError(
                            "compressed audio (MP3/AAC/...) requires a "
                            "codec library; only RIFF WAV PCM decodes "
                            "in-container"
                        )
                    samples, rate = AV.decode_wav(blob)
                    feats.append(AV.audio_features(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return multimodal.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Metadata-only projection — the query pattern that must NOT read
    payload bytes at scale (struct-field pruning; asserted in tests)."""
    mm = attach_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


def extract_features_arrow(multimodal: DataFrame, fake: bool = True) -> DataFrame:
    """mapInArrow twin of :func:`extract_features` — consumes raw
    ``pyarrow.RecordBatch``es with NO pandas materialization in
    between. For binary-heavy multimodal payloads this is the
    cheaper surface: pandas boxes each payload into a Python bytes
    object per row, while Arrow keeps the batch's binary buffer
    contiguous until the decoder actually reads it. Same output
    contract as the pandas twin (asserted equal in tests)."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            payloads = batch.column("payload").to_pylist()
            feats = decode_image_batch(pd.Series(payloads), fake=fake)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(feats, pa.list_(pa.float64())),
                ],
                names=["doc_id", "feature"],
            )

    return multimodal.mapInArrow(run, schema=FEATURE_SCHEMA)
