"""Multimodal (image/audio/video) columns as opaque binary payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

This is the plumbing a 100 TB multimodal training-data pipeline needs:
binary column + metadata schema, per-batch vectorized numpy kernels,
one-row-to-many-rows frame explosion — all real and tested. The image
path now runs a REAL codec: payloads are encoded as genuine 8-bit
grayscale PNGs (``encode_png_gray``) and decoded by a pure-numpy PNG
parser (``png_gray_decoder`` — chunk framing, zlib inflate, all five
RFC 2083 scanline filters). ``decode_image_features`` defaults to
that decoder (with a PIL fallback for other formats when installed);
``fake_gray_decoder`` remains as the raw-bytes interpretation used to
BUILD the fixture matrices. Audio/video remain byte-level
interpretations of the payload (no ffmpeg in this container).

Determinism contract with the DuckDB oracle: payloads here are UTF-8
bytes of ASCII document text, and every statistic is an EXACT integer
byte accumulation with a single final division — no float sum order
to drift between numpy, the JVM, and DuckDB.

Scale shape: every op is a per-row kernel inside mapInPandas — no
shuffle, no state, embarrassingly parallel over partitions; Arrow
moves columnar batches, numpy vectorizes within the batch. Partition
count is whatever the scan gives (widen_scan'd locally).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

HIST_BINS = 8  # 256 / 32
FRAME_BYTES = 64
FRAME_EVERY = 2


def _hround(x: float, dp: int = 6) -> float:
    p = float(10**dp)
    return math.floor(x * p + 0.5) / p


def media_type_for(doc_id: Column) -> Column:
    """Deterministic modality assignment (doc_id mod 3)."""
    return F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]), (doc_id % 3 + 1).cast("int"))


def to_media_table(docs: DataFrame) -> DataFrame:
    """documents -> media table: opaque binary payload + typed
    metadata. At scale this is the parquet layout you'd store:
    binary column, small metadata struct, modality partition key."""
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type_for(F.col("doc_id")).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("documents").alias("source"),
        ).alias("meta"),
    )


BYTE_STATS_SCHEMA = (
    "media_id bigint, media_type string, n_bytes int,"
    " byte_sum bigint, byte_min int, byte_max int, hist array<bigint>"
)


def byte_stats(media: DataFrame) -> DataFrame:
    """Payload byte census: size, sum, min/max, 8-bin histogram.
    The 'did the bytes survive the pipeline' integrity check."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    rows.append((mid, mtype, 0, 0, 0, 0, [0] * HIST_BINS))
                    continue
                hist = np.bincount(arr >> 5, minlength=HIST_BINS)
                rows.append(
                    (
                        mid,
                        mtype,
                        int(arr.size),
                        int(arr.sum(dtype=np.int64)),
                        int(arr.min()),
                        int(arr.max()),
                        [int(h) for h in hist],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "byte_sum",
                    "byte_min",
                    "byte_max",
                    "hist",
                ],
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, BYTE_STATS_SCHEMA
    )


AUDIO_STATS_SCHEMA = "media_id bigint, n_samples int, rms double, peak double"


def audio_waveform_stats(media: DataFrame) -> DataFrame:
    """'Decode' audio payloads as centered 8-bit PCM and compute
    RMS energy + peak amplitude. Integer square-sum, one division,
    one sqrt — bit-stable across engines."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
                n = int(arr.size)
                if n == 0:
                    rows.append((mid, 0, 0.0, 0.0))
                    continue
                sq = int((arr * arr).sum())
                rms = _hround(math.sqrt(sq / (n * 16384)))
                peak = _hround(int(np.abs(arr).max()) / 128.0)
                rows.append((mid, n, rms, peak))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "rms", "peak"])

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .mapInPandas(kernel, AUDIO_STATS_SCHEMA)
    )


FRAME_SAMPLE_SCHEMA = (
    "media_id bigint, frame_idx int, frame_len int, frame_sum bigint"
)


def frame_sample(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, every: int = FRAME_EVERY
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from video payloads
    (one input row -> many output rows; the UDTF shape). The ragged
    final frame is kept — exactly what a real frame sampler faces."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_frames = (arr.size + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    chunk = arr[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append(
                        (mid, i, int(chunk.size), int(chunk.sum(dtype=np.int64)))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_len", "frame_sum"]
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
    )


def fake_gray_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image codec: interpret the
    first w*w payload bytes (w = isqrt(len)) as a square grayscale
    image. Swap for a PIL/cv2 decode in production."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    w = math.isqrt(arr.size)
    return arr[: w * w].reshape(w, w)


# ------------------------------------------------------------------
# Real PNG codec (pure numpy + stdlib zlib) for 8-bit grayscale.
# The container has no PIL/cv2, but PNG is a fully-public spec
# (RFC 2083): chunk framing + zlib-deflated scanlines with 5
# per-row predictive filters. This gives the image path a REAL
# encode -> bytes -> parse -> unfilter decode, no injection needed.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    # RFC 2083 Paeth predictor: nearest of left/up/upper-left to a+b-c
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG. Scanline
    filters rotate through all five types (None/Sub/Up/Average/Paeth,
    row % 5) so a decode roundtrip exercises the full filter suite."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if h < 1 or w < 1:
        raise ValueError("PNG requires nonzero dimensions")
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = img[y].astype(np.int64)
        left = np.concatenate(([0], row[:-1]))
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:
            ul = np.concatenate(([0], prev[:-1]))
            pred = np.fromiter(
                (
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prev, ul)
                ),
                dtype=np.int64,
                count=w,
            )
            filt = row - pred
        raw.append(ftype)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_gray_decoder(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced grayscale PNG to a 2-D uint8
    array: chunk walk -> IDAT concat -> inflate -> per-row unfilter
    (all five RFC 2083 filter types)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w, h, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG (need 8-bit gray, no interlace)"
                )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("PNG scanline payload truncated")
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        scan = raw[y * stride : (y + 1) * stride]
        ftype = scan[0]
        cur = np.frombuffer(scan[1:], dtype=np.uint8).astype(np.int64)
        if ftype == 0:
            row = cur % 256
        elif ftype == 1:
            row = np.cumsum(cur) % 256
        elif ftype == 2:
            row = (cur + prev) % 256
        elif ftype == 3:
            row = np.empty(w, dtype=np.int64)
            left = 0
            for i in range(w):
                left = (cur[i] + (left + prev[i]) // 2) % 256
                row[i] = left
        elif ftype == 4:
            row = np.empty(w, dtype=np.int64)
            left = ul = 0
            for i in range(w):
                left = (cur[i] + _paeth(left, int(prev[i]), ul)) % 256
                row[i] = left
                ul = int(prev[i])
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out


def default_image_decoder(payload: bytes) -> np.ndarray:
    """Codec dispatch for image payloads: PNG via the pure-numpy
    decoder above; anything else through PIL when available. The
    NotImplementedError survives only for non-PNG payloads in a
    container without PIL."""
    if payload[:8] == _PNG_MAGIC:
        return png_gray_decoder(payload)
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore
    except ImportError:
        raise NotImplementedError(
            "non-PNG image payload and no PIL in this environment; "
            "inject decoder= with a codec for this format"
        )
    return np.asarray(Image.open(BytesIO(payload)).convert("L"))


PNG_MEDIA_SCHEMA = "media_id bigint, media_type string, payload binary"


def _png_encode_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Stage kernel of png_encode_images (module-level so fused
    operators can compose it generator-to-generator)."""
    for pdf in batches:
        rows = []
        for mid, mtype, payload in zip(
            pdf["media_id"], pdf["media_type"], pdf["payload"]
        ):
            img = fake_gray_decoder(payload)
            if img.shape[0] < 2:
                continue
            rows.append((mid, mtype, encode_png_gray(img)))
        yield pd.DataFrame(
            rows, columns=["media_id", "media_type", "payload"]
        )


def png_encode_images(media: DataFrame) -> DataFrame:
    """Re-encode image-modality payloads as REAL 8-bit grayscale PNGs
    (square matrix = first w*w payload bytes, w = isqrt(n)). This is
    the fixture-ingest step that turns opaque byte payloads into a
    genuine codec format so the decode path runs a real parser.
    Rows too small to form a >= 2x2 image are dropped (the decode
    stage skips them anyway). Map-only kernel — no shuffle."""
    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "payload")
        .mapInPandas(_png_encode_kernel, PNG_MEDIA_SCHEMA)
    )


IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, mean_pixel double, thumb array<double>"
)


def _image_features_kernel(decoder: Callable[[bytes], np.ndarray]):
    """Stage kernel factory of decode_image_features (module-level so
    fused operators can compose it generator-to-generator)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decoder(payload)
                w = int(img.shape[0])
                if w < 2:
                    continue
                mean_pixel = _hround(int(img.sum(dtype=np.int64)) / (img.size))
                half = w // 2
                crop = img[: 2 * half, : 2 * half].astype(np.int64)
                quads = crop.reshape(2, half, 2, half).sum(axis=(1, 3))
                thumb = [_hround(int(q) / (half * half)) for q in quads.flatten()]
                rows.append((mid, w, mean_pixel, thumb))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "mean_pixel", "thumb"]
            )

    return kernel


def decode_image_features(
    media: DataFrame, decoder: Callable[[bytes], np.ndarray] | None = None
) -> DataFrame:
    """Decode -> 2x2 block-mean thumbnail + mean pixel. ``decoder``
    maps payload bytes to a 2-D grayscale array; defaults to
    ``default_image_decoder`` (pure-numpy PNG parser, PIL fallback
    for other formats when installed)."""
    if decoder is None:
        decoder = default_image_decoder
    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(_image_features_kernel(decoder), IMAGE_FEATURES_SCHEMA)
    )


def png_roundtrip_features(
    media: DataFrame, decoder: Callable[[bytes], np.ndarray] | None = None
) -> DataFrame:
    """decode_image_features(png_encode_images(media)) fused into ONE
    Python stage: the two stage kernels are composed
    generator-to-generator, so the multi-KB PNG payload batch crosses
    the JVM<->Python Arrow boundary once instead of twice (measured
    ~25% faster at sf0.1: 0.73s -> 0.56s min-of-5). Semantics cannot
    drift from the two-stage form — it IS the same kernels — and the
    round-trip-equals-chained contract is pinned in
    tests/test_multimodal.py."""
    if decoder is None:
        decoder = default_image_decoder
    features = _image_features_kernel(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return features(_png_encode_kernel(batches))

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "payload")
        .mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)
    )


SCENE_CUT_DELTA = 4  # mean-byte units between adjacent frames

SCENE_CUTS_SCHEMA = (
    "media_id bigint, n_frames int, n_cuts int, first_cut int,"
    " min_mean bigint, max_mean bigint"
)


def scene_cuts(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    threshold: int = SCENE_CUT_DELTA,
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over video payloads — the
    frame-DELTA pattern every video curation pipeline runs before
    sampling keyframes: a cut at frame i > 0 when the integer
    per-frame mean jumps by >= ``threshold`` from frame i-1.

    Exactness contract: frame mean = byte_sum DIV frame_len (integer
    floor division — no float averaging), so the cut decisions are
    bit-portable to the oracle's lag-window formulation. Per-row
    kernel, no shuffle; the ragged last frame participates with its
    own length, same as frame_sample."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    continue
                n_frames = (arr.size + frame_bytes - 1) // frame_bytes
                means = []
                for i in range(n_frames):
                    chunk = arr[i * frame_bytes : (i + 1) * frame_bytes]
                    means.append(int(chunk.sum(dtype=np.int64)) // chunk.size)
                cuts = [
                    i
                    for i in range(1, n_frames)
                    if abs(means[i] - means[i - 1]) >= threshold
                ]
                rows.append(
                    (
                        int(mid),
                        n_frames,
                        len(cuts),
                        cuts[0] if cuts else -1,
                        min(means),
                        max(means),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "n_cuts",
                    "first_cut",
                    "min_mean",
                    "max_mean",
                ],
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(kernel, SCENE_CUTS_SCHEMA)
    )


DHASH_SCHEMA = "media_id bigint, b0 int, b1 int, b2 int, b3 int"


def dhash_bands(
    media: DataFrame, decoder: Callable[[bytes], np.ndarray] | None = None
) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint per image,
    emitted as four 16-bit bands for LSH blocking: the image is
    block-mean resampled onto an 8x9 grid (equal integer-sized
    blocks, so cell sums compare exactly without division) and each
    of the 64 bits records whether a cell outranks its right
    neighbor — the classic gradient hash that survives re-encodes
    and brightness shifts.

    Band layout matches the simhash family: bit p of the 64-bit hash
    (p = 63 - (row*8 + col), row-major, MSB first) lands in band
    p // 16, as the value ``(h >> 16k) & 0xFFFF``. All arithmetic is
    exact int64; the PNG roundtrip upstream is lossless, so an
    engine twin can recompute the same cells from the raw bytes.

    Map-only kernel — no shuffle; rows narrower than the 9-col grid
    are dropped (no meaningful gradient)."""
    if decoder is None:
        decoder = default_image_decoder

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decoder(payload)
                w = int(img.shape[0])
                if w < 9:
                    continue
                hr, wc = w // 8, w // 9
                crop = img[: 8 * hr, : 9 * wc].astype(np.int64)
                cells = crop.reshape(8, hr, 9, wc).sum(axis=(1, 3))
                bits = (cells[:, :8] > cells[:, 1:]).flatten()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                rows.append(
                    (mid, *[(h >> (16 * k)) & 0xFFFF for k in range(4)])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(kernel, DHASH_SCHEMA)
    )
