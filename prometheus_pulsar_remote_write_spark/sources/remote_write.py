"""A1/A4: the remote-write wire edges as DataFrame operators.

Ingest (A1, reference pkg/app/produce.go:124-153): a body is
snappy(proto(WriteRequest)). ``decode_remote_write`` turns a DataFrame of
raw bodies (binary column, e.g. from a binaryFile batch/stream source or
an HTTP collector drop-dir) into WRITE_REQUEST-shaped rows. Decode
failures yield a null timeseries (the reference answers 400 and drops the
request) -- split good/bad downstream.

Egress (A4, reference pkg/remote/write.go:184-196): ``encode_remote_write``
renders nested WriteRequest rows back to snappy(proto) bodies ready to POST.

Both are Arrow-batched mapInPandas stages: narrow, no shuffle, scale with
input partitions. The heavy lifting per row is pure-Python codec work,
which is exactly the kind of per-record transcoding the reference also
does once per request.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schema import TIMESERIES_SCHEMA
from . import prompb, snappy_codec


def _decoded_schema(keep_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        list(keep_fields)
        + [
            T.StructField("timeseries", T.ArrayType(TIMESERIES_SCHEMA), True),
            T.StructField("decode_error", T.StringType(), True),
        ]
    )


def decode_remote_write(
    df: DataFrame, body_col: str = "content", keep_cols: list[str] | None = None
) -> DataFrame:
    """snappy(proto) bodies -> WriteRequest rows (+ decode_error for poison)."""
    keep_cols = keep_cols or []
    out_schema = _decoded_schema([f for f in df.schema.fields if f.name in keep_cols])
    names = [f.name for f in out_schema.fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, body in enumerate(pdf[body_col]):
                base = {c: pdf[c].iloc[i] for c in keep_cols}
                try:
                    raw = snappy_codec.decompress(bytes(body))
                    req = prompb.decode_write_request(raw)
                    base.update(timeseries=req["timeseries"], decode_error=None)
                except Exception as exc:  # 400-path: keep the poison visible
                    base.update(timeseries=None, decode_error=str(exc))
                rows.append(base)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(_decode, out_schema)


def encode_remote_write(
    df: DataFrame, timeseries_col: str = "timeseries", keep_cols: list[str] | None = None
) -> DataFrame:
    """Nested WriteRequest rows -> snappy(proto) request bodies."""
    keep_cols = keep_cols or []
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep_cols]
        + [T.StructField("body", T.BinaryType(), False)]
    )
    names = [f.name for f in out_schema.fields]

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, ts_list in enumerate(pdf[timeseries_col]):
                base = {c: pdf[c].iloc[i] for c in keep_cols}
                req = {
                    "timeseries": [
                        {
                            "labels": [dict(l) for l in ts["labels"]],
                            "samples": [dict(s) for s in ts["samples"]],
                        }
                        for ts in ts_list
                    ]
                }
                base["body"] = snappy_codec.compress(prompb.encode_write_request(req))
                rows.append(base)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(_encode, out_schema)
