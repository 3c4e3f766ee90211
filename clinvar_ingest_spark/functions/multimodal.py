"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas`` — the
same vectorized path as text extraction. The actual codec work (JPEG
decode, resample, frame sampling) needs libs absent from this sandbox,
so the decode step is STUBBED behind ``decode_stub`` with a
deterministic byte-level feature extraction standing in; the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum64", T.LongType()),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decode.

    Real implementation would be e.g. PIL/libjpeg frame decode +
    resize + feature extraction; sandbox lacks the codecs, so we emit
    byte-level features (size, first byte, additive checksum over the
    first 64 bytes). Raise for the unimplemented real path::

        raise NotImplementedError("image decode requires PIL/libvips")
    """
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum64": int(sum(payload[:64]) % 997),
    }


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    One pandas DataFrame per Arrow batch; vectorized per batch; output
    schema fixed (FEATURE_SCHEMA) so downstream plans are stable."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(decode_stub)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)
