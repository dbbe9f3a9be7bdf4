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
    DoubleType,
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


# --- real image-container headers (pure public byte formats) ---------
# PNG: 8-byte signature, then the IHDR chunk (always first): 4-byte
#   length, 'IHDR', width/height as big-endian uint32 (PNG spec §5.2,
#   §11.2.2). GIF: 'GIF87a'/'GIF89a', then the logical screen width /
#   height as little-endian uint16 (GIF89a spec §18). JPEG/JFIF: SOI
#   marker, then marker segments each [FF, type, len(BE16, includes
#   itself)]; the SOFn segment (C0-C3) carries precision(1),
#   height(BE16), width(BE16) (ITU T.81 §B.2.2).
PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_PRE = (
    b"\xff\xd8"  # SOI
    b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x48\x00\x48\x00\x00"  # APP0
    b"\xff\xc0\x00\x11\x08"  # SOF0 marker, len 17, precision 8
)
_JPEG_POST = b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # 3 components


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """Header-only (media_type, width, height) for PNG / GIF / JPEG
    payloads, None when the bytes are not a recognized container. No
    decode library: these are fixed public byte layouts (see the
    format notes above). The JPEG path walks marker segments
    generically — any APPn/DQT/DHT prefix length is handled, not just
    the synthetic builder's layout."""
    if payload is None or len(payload) < 10:
        return None
    if (
        len(payload) >= 24
        and payload[:8] == PNG_SIG
        and payload[12:16] == b"IHDR"
    ):
        return (
            "image/png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "image/gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i < len(payload) and payload[i] == 0xFF:
            # ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may
            # precede a marker code — skip them (ADVICE r10).
            while i < len(payload) and payload[i] == 0xFF:
                i += 1
            if i >= len(payload):
                return None
            marker = payload[i]
            i += 1
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                if i + 7 > len(payload):
                    return None
                return (
                    "image/jpeg",
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                    int.from_bytes(payload[i + 3 : i + 5], "big"),
                )
            if marker in (0xD9, 0xDA):  # EOI / SOS: no SOF seen
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                # TEM / RSTn: standalone markers, no length field
                # (T.81 table B.1) — continue to the next marker.
                continue
            if i + 2 > len(payload):
                return None
            seglen = int.from_bytes(payload[i : i + 2], "big")
            if seglen < 2:
                return None
            i += seglen
        return None
    return None


def _be_bytes(col, n_bytes: int):
    """Big-endian fixed-width binary of a small non-negative int column
    — hex/lpad/unhex, all JVM-side Column expressions."""
    return F.unhex(F.lpad(F.hex(col), n_bytes * 2, "0"))


def _le16_bytes(col):
    hx = F.lpad(F.hex(col), 4, "0")
    return F.unhex(F.concat(F.substring(hx, 3, 2), F.substring(hx, 1, 2)))


def synth_width(id_col):
    return (id_col * 7) % 1920 + 16


def synth_height(id_col):
    return (id_col * 13) % 1080 + 16


def attach_synth_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize payloads with REAL container headers (VERDICT r9 #3):
    by doc_id % 4, docs get a valid PNG / JPEG+JFIF / GIF89a header
    (deterministic width/height written into the actual header bytes,
    text bytes as the opaque body) or a raw unrecognizable payload —
    so ``extract_media_meta``'s parser exercises every branch and the
    DuckDB twin re-parses the same bytes. Pure Column expressions
    (concat of binary literals + hex/unhex int encoding), no UDF."""
    did = F.col(id_col)
    body = F.coalesce(
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()),
        F.lit(b""),
    )
    w = synth_width(did).cast("int")
    h = synth_height(did).cast("int")
    png = F.concat(
        F.lit(PNG_SIG + b"\x00\x00\x00\x0dIHDR"),
        _be_bytes(w, 4),
        _be_bytes(h, 4),
        F.lit(b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"),
        body,
    )
    jpeg = F.concat(
        F.lit(_JPEG_PRE), _be_bytes(h, 2), _be_bytes(w, 2),
        F.lit(_JPEG_POST), body,
    )
    gif = F.concat(
        F.lit(b"GIF89a"), _le16_bytes(w), _le16_bytes(h),
        F.lit(b"\xf7\x00\x00"), body,
    )
    sel = F.pmod(did, F.lit(4))
    return df.withColumn(
        "media",
        F.when(sel == 0, png)
        .when(sel == 1, jpeg)
        .when(sel == 2, gif)
        .otherwise(body),
    )


try:  # auto-activate on any container that ships PIL — no code change
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None

HAVE_PIL = _PILImage is not None


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode: (width, height) via PIL when the library is
    present; the documented stub path otherwise. ``extract_media_meta``
    stays the deterministic oracle-checkable twin either way — this is
    the hook a real cluster (with PIL baked into the image) uses."""
    if _PILImage is None:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "use extract_media_meta (deterministic stub) instead"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return im.size


def extract_media_meta_real(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The PIL-backed twin of ``extract_media_meta``: same schema, same
    Arrow-batched shape, real width/height. Raises at plan time when PIL
    is absent so the failure is loud and driver-side, not a task-time
    surprise on 1000 executors."""
    if _PILImage is None:
        raise NotImplementedError("PIL not available; use extract_media_meta")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["media"].map(decode_image_real)
            checksum = pdf["media"].map(
                lambda b: int.from_bytes(b[:8].ljust(8, b"\0"), "big") % (1 << 60)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/decoded",
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "width": dims.map(lambda wh: wh[0]).astype("int32"),
                    "height": dims.map(lambda wh: wh[1]).astype("int32"),
                    "checksum": checksum.astype("int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(_extract, MEDIA_META_SCHEMA)


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column: REAL
    header parsing for PNG / GIF / JPEG payloads (``parse_image_dims``
    — public byte formats, no decode library needed for dimensions),
    and the documented deterministic stub (checksum-derived fake dims,
    media_type 'image/fake') only for payloads no container matches.
    The per-batch pandas function is the template for any real decode /
    resize / frame-sample operator; a full pixel decode would swap
    ``decode_image_real`` (PIL, auto-activated when present) into the
    same kernel."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            checksum = payloads.map(
                lambda b: int.from_bytes(
                    (b or b"")[:8].ljust(8, b"\0"), "big"
                )
                % (1 << 60)
            )
            parsed = payloads.map(parse_image_dims)
            fake_w = (checksum % 640 + 1).astype("int32")
            fake_h = (checksum % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": parsed.combine(
                        pd.Series("image/fake", index=parsed.index),
                        lambda p, d: p[0] if p else d,
                    ),
                    "n_bytes": n_bytes.astype("int64"),
                    "width": parsed.combine(
                        fake_w, lambda p, d: p[1] if p else d
                    ).astype("int32"),
                    "height": parsed.combine(
                        fake_h, lambda p, d: p[2] if p else d
                    ).astype("int32"),
                    "checksum": checksum.astype("int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(_extract, MEDIA_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("n_frame_bytes", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 32,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling over an opaque binary column — the 1:N
    Arrow expansion shape (one input payload -> many frame rows) every
    real video pipeline needs. The synthetic 'codec' treats the payload
    as fixed-size frames (frame_bytes each) at 25 fps and keeps an
    evenly-strided sample of at most max_frames; a real decoder swaps
    the slice loop for pyav/ffmpeg, the Spark-side contract (schema,
    batching, expansion, partitioning) is identical and is what this
    operator pins. Deterministic, so the DuckDB oracle reproduces every
    frame row from the blob bytes."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, sizes, sums = [], [], [], [], []
            for doc, blob in zip(pdf[id_col], pdf["media"]):
                n = len(blob) // frame_bytes
                if n == 0:
                    continue
                stride = max(1, -(-n // max_frames))  # ceil(n/max)
                for i in list(range(0, n, stride))[:max_frames]:
                    sl = blob[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc)
                    idxs.append(i)
                    tss.append(i * 40)  # 25 fps
                    sizes.append(len(sl))
                    sums.append(
                        int.from_bytes(sl[:8].ljust(8, b"\0"), "big")
                        % (1 << 60)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(_frames, FRAME_SCHEMA)


WAVEFORM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_index", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("n_chunk_bytes", LongType()),
        StructField("mean_energy", DoubleType()),
    ]
)


def chunk_waveform(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk_bytes: int = 128,
    max_chunks: int = 6,
) -> DataFrame:
    """Audio chunking + feature extraction over an opaque binary
    column: split the payload into fixed-size waveform windows (the
    synthetic codec treats it as 1 kHz 8-bit PCM: chunk_bytes bytes =
    chunk_bytes ms), keep the first max_chunks, and emit one row per
    chunk with a computed signal statistic (mean byte energy) — the
    exact dataflow a real fingerprinting/VAD pass uses with librosa or
    torchaudio swapped into the per-chunk loop. Deterministic from the
    blob bytes, so the DuckDB oracle reproduces every chunk row."""
    import math

    import numpy as np

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, sizes, energies = [], [], [], [], []
            for doc, blob in zip(pdf[id_col], pdf["media"]):
                n_chunks = min(
                    -(-len(blob) // chunk_bytes), max_chunks
                )
                for i in range(n_chunks):
                    sl = blob[i * chunk_bytes : (i + 1) * chunk_bytes]
                    if not sl:
                        continue
                    arr = np.frombuffer(sl, dtype=np.uint8)
                    ids.append(doc)
                    idxs.append(i)
                    starts.append(i * chunk_bytes)  # 1 byte == 1 ms
                    sizes.append(len(sl))
                    # half-UP rounding (not Python's half-even): byte
                    # sums / power-of-two lengths land exactly on .5
                    # ties, and SQL round() is half-away-from-zero
                    mean = float(arr.sum()) / len(sl)
                    energies.append(math.floor(mean * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_index": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "n_chunk_bytes": pd.Series(sizes, dtype="int64"),
                    "mean_energy": pd.Series(energies, dtype="float64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(_chunks, WAVEFORM_SCHEMA)
