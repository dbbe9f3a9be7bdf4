"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The real Spark-side machinery — schema, batch iteration, partition
shape — is implemented and tested; the actual media decode is STUBBED
(image/audio libraries are not in this container): ``decode_image_meta``
derives deterministic fake dimensions from the payload bytes, and
``decode_image_real`` raises NotImplementedError where PIL would be
called. Swapping the stub for a real decoder changes ONE function, not
the pipeline.

Scale notes: mapInPandas streams Arrow record batches — payloads never
materialize on the driver; batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Binary payloads of mixed
size skew partitions — repartition by a size-bucket column first when
payloads exceed ~10 MB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata has no binary media; derive an opaque payload from the
    text bytes so the binary-column path is exercised end to end."""
    return df.withColumn("media", F.encode(F.col(text_col), "utf-8").cast(BinaryType()))


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Where the real decoder goes (PIL.Image.open(BytesIO(payload)))."""
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "use decode_image_meta (deterministic stub) instead"
    )


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column. The
    per-batch pandas function is the template for any real decode /
    resize / frame-sample operator."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            n_bytes = payloads.map(len)
            # deterministic fake decode: dimensions derived from content
            checksum = payloads.map(
                lambda b: int.from_bytes(b[:8].ljust(8, b"\0"), "big") % (1 << 60)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/fake",
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (checksum % 640 + 1).astype("int32"),
                    "height": (checksum % 480 + 1).astype("int32"),
                    "checksum": checksum.astype("int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(_extract, MEDIA_META_SCHEMA)
