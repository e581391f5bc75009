"""Multimodal column handling — binary payloads with typed metadata.

Image/audio/video are opaque ``binary`` columns processed by Arrow-batched
``mapInPandas`` kernels, exactly like the text-extraction kernel (U1). The
actual codec libraries are not in this container, so the decode step is a
deterministic STUB (md5-derived fake dimensions) behind ``_decode_image``;
the Spark-side plumbing — schema, batching, partitioning, UDF signature —
is real and tested. Swap ``_decode_image`` for PIL/ffmpeg on a real
cluster without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "url string, n_bytes long, format string, width long, height long, "
    "phash long"
)


def _decode_image(payload: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata from the payload hash.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    raise NotImplementedError there if the codec is unavailable. The fake
    is deterministic so tests pin the plumbing end-to-end.
    """
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "format": "empty", "width": 0, "height": 0, "phash": 0}
    h = hashlib.md5(payload).digest()
    return {
        "n_bytes": len(payload),
        "format": ["jpeg", "png", "webp", "gif"][h[0] % 4],
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def decode_binary_column(df: DataFrame, binary_col: str = "payload",
                         key_col: str = "url") -> DataFrame:
    """df(key, binary) → typed metadata rows via mapInPandas.

    Arrow batch sizing matters for large blobs — the session sets
    spark.sql.execution.arrow.maxRecordsPerBatch low (2048) so a batch of
    multi-MB payloads stays within executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image(p) for p in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", list(pdf[key_col]))
            yield out

    return df.select(key_col, binary_col).mapInPandas(run, DECODED_SCHEMA)
