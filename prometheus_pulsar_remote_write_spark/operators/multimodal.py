"""Multimodal column plumbing (SURVEY.md §2.F F5).

Image/audio/video ride as opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side machinery -- schema, Arrow batching
through mapInPandas, partition-friendly layout -- is real and tested; the
actual media decode is stubbed (no image/audio libraries in this
container) behind ``decode_media``:

  - ``fake=True`` (default): a deterministic fake decoder that derives
    width/height/duration from the payload bytes, so pipelines and tests
    exercise the full path reproducibly.
  - ``fake=False``: raises NotImplementedError where a real
    PIL/ffmpeg/soundfile call would go.

At 100 TB the binary payloads dominate I/O: keep them in their own
parquet column (never a join key), filter on the metadata struct first so
column pruning skips payload pages for rows the query rejects.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)

DECODED_FIELDS = [
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("decode_status", T.StringType(), True),
]


def attach_media(df: DataFrame, payload_expr, media_type: str = "image/png") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    ``payload_expr`` is any Column producing binary (in tests: encode(text)
    as a deterministic stand-in for real media bytes).
    """
    payload = payload_expr.cast("binary")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col("media")).cast("long").alias("n_bytes"),
            F.md5(F.col("media")).alias("checksum"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': dimensions derived from content bytes."""
    n = len(payload)
    width = 16 + (payload[0] if n else 0)
    height = 16 + (payload[-1] if n else 0)
    duration = n * 10
    return width, height, duration


def decode_media(
    df: DataFrame, payload_col: str = "media", fake: bool = True, batch_hint: int = 0
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    The UDF signature, output schema, and batch shape are exactly what a
    real decoder needs; only the per-payload body is stubbed. Narrow stage:
    scales with input partitions, no shuffle.
    """
    keep_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(keep_fields + DECODED_FIELDS)
    keep = [f.name for f in keep_fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            widths, heights, durations, statuses = [], [], [], []
            for payload in pdf[payload_col]:
                if not fake:
                    raise NotImplementedError(
                        "real media decode needs PIL/ffmpeg/soundfile -- not in "
                        "this container; run with fake=True"
                    )
                try:
                    w, h, d = _fake_decode(bytes(payload))
                    widths.append(w), heights.append(h), durations.append(d)
                    statuses.append("ok")
                except Exception as exc:
                    widths.append(None), heights.append(None), durations.append(None)
                    statuses.append(f"error: {exc}")
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["duration_ms"] = pd.array(durations, dtype="Int64")
            out["decode_status"] = statuses
            yield out

    return df.mapInPandas(_decode, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "media",
    frame_bytes: int = 64,
    every_nth: int = 4,
) -> DataFrame:
    """Frame sampling for video/audio payloads (decode stand-in).

    Treats the binary payload as a sequence of ``frame_bytes`` chunks
    ("frames"), keeps every ``every_nth`` one, and emits per-row
    (n_frames, n_sampled, frame_checksums). A real codec would replace
    the chunking with actual frame extraction; the Arrow batch shape,
    output schema, and partition behavior (narrow stage, no shuffle) are
    exactly what the real thing needs.
    """
    import hashlib

    keep_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        keep_fields
        + [
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("n_sampled", T.IntegerType(), True),
            T.StructField("frame_checksums", T.ArrayType(T.StringType()), True),
        ]
    )
    keep = [f.name for f in keep_fields]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            n_frames, n_sampled, checksums = [], [], []
            for payload in pdf[payload_col]:
                data = bytes(payload)
                nf = (len(data) + frame_bytes - 1) // frame_bytes
                picked = [
                    hashlib.md5(
                        data[i * frame_bytes : (i + 1) * frame_bytes]
                    ).hexdigest()
                    for i in range(0, nf, every_nth)
                ]
                n_frames.append(nf)
                n_sampled.append(len(picked))
                checksums.append(picked)
            out["n_frames"] = pd.array(n_frames, dtype="Int32")
            out["n_sampled"] = pd.array(n_sampled, dtype="Int32")
            out["frame_checksums"] = checksums
            yield out

    return df.mapInPandas(_sample, out_schema)


def resize_media(
    df: DataFrame, payload_col: str = "media", target_pixels: int = 256
) -> DataFrame:
    """Resize stand-in for image payloads: stride-sample the payload down
    to <= ``target_pixels`` bytes (a real implementation swaps the stride
    loop for PIL's resample; schema, Arrow batching, and the narrow
    no-shuffle stage are identical). Emits the resized size and a
    checksum of the resized bytes so downstream dedup can run on
    thumbnails instead of full payloads.
    """
    import hashlib

    keep_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        keep_fields
        + [
            T.StructField("orig_bytes", T.LongType(), True),
            T.StructField("resized_bytes", T.IntegerType(), True),
            T.StructField("resized_checksum", T.StringType(), True),
        ]
    )
    keep = [f.name for f in keep_fields]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            orig, rb, ck = [], [], []
            for payload in pdf[payload_col]:
                data = bytes(payload)
                n = len(data)
                stride = max(n // target_pixels, 1)
                resized = data[::stride][:target_pixels]
                orig.append(n)
                rb.append(len(resized))
                ck.append(hashlib.md5(resized).hexdigest())
            out["orig_bytes"] = pd.array(orig, dtype="Int64")
            out["resized_bytes"] = pd.array(rb, dtype="Int32")
            out["resized_checksum"] = ck
            yield out

    return df.mapInPandas(_resize, out_schema)


def window_energy(
    df: DataFrame,
    payload_col: str = "media",
    window_bytes: int = 32,
    hop_bytes: int = 16,
) -> DataFrame:
    """Windowed energy extraction for audio payloads (feature stand-in).

    Treats the binary payload as PCM-ish samples and computes the
    summed byte value per ``window_bytes`` window at ``hop_bytes`` hop
    -- the shape of a real STFT/energy front-end: overlapping windows,
    one feature row per window, integer arithmetic. Emits per-row
    (n_windows, energy_digest, max_energy, max_energy_win). A real
    audio codec would replace the byte sum with the actual frame
    transform; the Arrow batch shape, overlap logic, and narrow-stage
    partition behavior carry over unchanged.
    """
    import hashlib

    keep_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        keep_fields
        + [
            T.StructField("n_windows", T.IntegerType(), True),
            T.StructField("energy_digest", T.StringType(), True),
            T.StructField("max_energy", T.LongType(), True),
            T.StructField("max_energy_win", T.IntegerType(), True),
        ]
    )
    keep = [f.name for f in keep_fields]

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            n_windows, digests, maxes, argmaxes = [], [], [], []
            for payload in pdf[payload_col]:
                data = bytes(payload)
                energies = []
                i = 0
                while i < len(data):
                    energies.append(sum(data[i : i + window_bytes]))
                    i += hop_bytes
                n_windows.append(len(energies))
                digests.append(
                    hashlib.md5(",".join(str(e) for e in energies).encode()).hexdigest()
                )
                if energies:
                    best = max(range(len(energies)), key=lambda j: (energies[j], -j))
                    maxes.append(energies[best])
                    argmaxes.append(best)
                else:
                    maxes.append(0)
                    argmaxes.append(-1)
            out["n_windows"] = pd.array(n_windows, dtype="Int32")
            out["energy_digest"] = digests
            out["max_energy"] = pd.array(maxes, dtype="Int64")
            out["max_energy_win"] = pd.array(argmaxes, dtype="Int32")
            yield out

    return df.mapInPandas(_energy, out_schema)
