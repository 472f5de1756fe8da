"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
``mapInPandas`` stages. ``decode_image`` is REAL for PNG — a
pure-stdlib decoder (``decode_png``: chunk walk, zlib inflate, filter
reconstruction per the PNG spec §9; 8-bit gray/RGB/palette/gray-
alpha/RGBA, non-interlaced). ``decode_wav`` is REAL for RIFF PCM
audio (chunk walk + 8/16-bit PCM de-interleave, validated against
stdlib ``wave`` in tests). Other formats (JPEG, mp3, video) raise
NotImplementedError (their codecs aren't in this container) — for
those the feature/frame stages fall back to clearly-marked
deterministic fakes, but the Spark-side plumbing (schemas, batch
shapes, partitioning, UDF signatures) is real and tested, which is
the part that matters for the 100 TB design.

Scale notes: binary payloads dominate row size, so these stages set
``spark.sql.files.maxPartitionBytes``-friendly batch shapes (small
maxRecordsPerBatch), never collect, and emit fixed-width feature rows
that are orders of magnitude smaller than their inputs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (PNG spec §9): each line is
    [filter_type][stride bytes]; reconstruction of Sub/Paeth is a
    left-to-right recurrence, done per byte (fine for the metadata/
    fixture path; throughput decoding belongs to a native codec)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(out[y - 1][i - bpp]) if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (no PIL): signature + chunk walk, IDAT
    zlib inflate, filter reconstruction, palette expansion.

    Supports bit depth 8, color types 0/2/3/4/6, non-interlaced — the
    dominant real-world configurations. Returns
    ``{width, height, channels, pixels}`` with pixels a
    (height, width, channels) uint8 array (palette expanded to RGB).
    Raises ValueError on malformed bytes, NotImplementedError on
    unsupported (16-bit / sub-byte / interlaced) variants.
    """
    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC (CRC not verified)
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError("bad IHDR length")
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype = data[8], data[9]
            interlace = data[12]
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} unsupported "
            "(8-bit non-interlaced only)"
        )
    nch = _PNG_CHANNELS[ctype]
    stride = w * nch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    px = _png_unfilter(raw, h, stride, nch).reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        px = plte[px[:, :, 0]]
        nch = 3
    return {"width": w, "height": h, "channels": nch, "pixels": px}


def _png_filter_row(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward per-scanline filter (PNG spec §9) — the encoder side of
    ``_png_unfilter``."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = line[i]
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (x - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """Pure-stdlib PNG encode: (h, w, c) uint8 -> valid PNG bytes
    (8-bit, non-interlaced; c in {1: gray, 2: gray+alpha, 3: RGB,
    4: RGBA}). ``filters`` picks the per-row filter type (default all
    0); any choice round-trips through ``decode_png``."""
    import struct

    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters if filters is not None else [0] * h
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w * c)
    for y in range(h):
        line = pixels[y].tobytes()
        raw += bytes([filters[y]]) + _png_filter_row(filters[y], line, prev, c)
        prev = line
    return (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOFn frame headers; DHT/JPG/DAC excluded


def image_dims(payload: bytes) -> dict:
    """Header-only (width, height, format) for PNG / JPEG / GIF / BMP —
    no pixel decode, just the container's dimension fields, the piece
    of metadata a curation pipeline filters on (min-resolution rules)
    without paying a decode. Pure stdlib marker/chunk walks:

    * PNG: IHDR bytes 0-8 (spec §11.2.2)
    * JPEG: segment walk to the first SOFn marker (ITU T.81 §B.2.2);
      height/width are big-endian at offsets 3/5 of the frame header
    * GIF: logical screen descriptor, little-endian uint16 at 6/8
    * BMP: BITMAPINFOHEADER int32s at 18/22 (height may be negative =
      top-down; absolute value reported)

    Raises ValueError for anything else (caller keeps the error row).
    """
    b = payload or b""
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        if len(b) < 24:
            raise ValueError("truncated PNG")
        return {
            "format": "png",
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
        }
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            marker = b[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
            if marker in _SOF_MARKERS:
                if pos + 9 > len(b):
                    raise ValueError("truncated JPEG SOF")
                return {
                    "format": "jpeg",
                    "height": int.from_bytes(b[pos + 5 : pos + 7], "big"),
                    "width": int.from_bytes(b[pos + 7 : pos + 9], "big"),
                }
            pos += 2 + seg_len
        raise ValueError("no JPEG SOF marker found")
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            raise ValueError("truncated GIF")
        return {
            "format": "gif",
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
        }
    if b[:2] == b"BM":
        if len(b) < 26:
            raise ValueError("truncated BMP")
        return {
            "format": "bmp",
            "width": abs(int.from_bytes(b[18:22], "little", signed=True)),
            "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
        }
    raise ValueError("unrecognized image container")


def decode_image(payload: bytes) -> dict:
    """Codec entry point: REAL for PNG (``decode_png``); other formats
    need PIL/opencv, not present in this container — swap the fallback
    for a real decoder in deployment."""
    if payload and payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only PNG decoding is built in; JPEG/audio/video codecs are not "
        "present in this container — plug a real decoder here in deployment"
    )


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_digest", StringType()),
        StructField("decode_err", StringType()),
    ]
)


def decode_image_stage(media: DataFrame) -> DataFrame:
    """Distributed decode: PNG payloads decode for real (dims +
    md5 of the reconstructed pixel buffer); undecodable payloads keep
    their error string instead of failing the stage (at 100 TB a
    corrupt member must not kill the job). Output rows are fixed-width
    — the multi-KB payload column is dropped at this stage boundary."""

    def run(batches):
        for pdf in batches:
            ids, ws, hs, cs, digs, errs = [], [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    img = decode_image(bytes(b or b""))
                    ws.append(img["width"])
                    hs.append(img["height"])
                    cs.append(img["channels"])
                    digs.append(
                        hashlib.md5(np.ascontiguousarray(img["pixels"])).hexdigest()
                    )
                    errs.append(None)
                except (ValueError, NotImplementedError, zlib.error) as e:
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    digs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": ids, "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "pixel_digest": digs, "decode_err": errs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DECODE_SCHEMA)


def extract_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata for opaque payloads: byte length + md5 digest.

    No decode needed — this is the real (non-stub) part of the stage.
    """

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, META_SCHEMA)


def fake_feature_extract(media: DataFrame, dim: int = 8) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from the
    payload digest (stands in for a CNN/audio-net forward pass; the
    batch shape, schema, and Arrow transfer are the real contract)."""

    def run(batches):
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                d = hashlib.md5(b or b"").digest()
                feats.append([d[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, frame_size: int = 1000) -> DataFrame:
    """STUB frame sampler: emits one row per frame_size-byte slice (a
    real implementation would demux the container and sample I-frames;
    the row-explosion shape and schema are the real contract)."""

    def run(batches):
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = b or b""
                n = max((len(b) + frame_size - 1) // frame_size, 0)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(b[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/oracles: treat each document's UTF-8 bytes as
    an opaque payload (keeps the whole pipeline runnable on the driver
    test tables without real media files)."""
    from pyspark.sql import functions as F

    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) codec — real, pure stdlib+numpy (new in round 5)
# ---------------------------------------------------------------------------

_WAV_FMT = struct.Struct("<HHIIHH")  # format, ch, rate, byterate, block, bits


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize int16 PCM samples — shape (n,) mono or (n, channels) —
    into a canonical RIFF/WAVE container (PCM format 1, 16-bit LE)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    block = ch * 2
    fmt = _WAV_FMT.pack(1, ch, sample_rate, sample_rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """REAL WAV decoder: RIFF chunk walk (word-aligned per the spec),
    fmt parse, PCM 8/16-bit de-interleave. Returns sample_rate,
    channels, bits, n_frames and the samples as an (n_frames,
    channels) int16 ndarray (8-bit input is re-centered to signed,
    matching stdlib ``wave``'s unsigned-8 convention).

    Raises ValueError on malformed bytes, NotImplementedError on
    non-PCM formats (mp3/aac need codec libraries this container
    doesn't have — plug one in here in deployment)."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if pos + 8 + sz > len(b) and cid in (b"fmt ", b"data"):
            # a declared size past the payload end means the file was
            # truncated in transit; silently decoding the partial data
            # chunk would be indistinguishable from a complete shorter
            # recording downstream (ADVICE r5)
            raise ValueError(
                f"truncated {cid.decode('ascii').strip()} chunk: declares "
                f"{sz} bytes, only {len(b) - pos - 8} remain"
            )
        chunk = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and fmt is None:
            fmt = chunk
        elif cid == b"data" and data is None:
            data = chunk
        pos += 8 + sz + (sz & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _byterate, block, bits = _WAV_FMT.unpack_from(fmt)
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format {audio_format} not supported; only PCM (1) is "
            "built in — plug a real codec here in deployment"
        )
    if ch < 1 or block != ch * (bits // 8):
        raise ValueError("inconsistent fmt chunk")
    usable = len(data) // block * block
    if bits == 16:
        arr = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, ch)
    elif bits == 8:
        arr = (
            np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int16)
            - 128
        ).reshape(-1, ch)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return {
        "sample_rate": int(rate),
        "channels": int(ch),
        "bits": int(bits),
        "n_frames": int(arr.shape[0]),
        "samples": arr.astype(np.int16, copy=False),
    }


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sum_sq", LongType()),
        StructField("peak", IntegerType()),
        StructField("decode_err", StringType()),
    ]
)


def audio_stats_stage(media: DataFrame) -> DataFrame:
    """Distributed audio decode + loudness stats: WAV payloads decode
    for real; stats are exact integers (energy = sum of squared
    samples, peak = max |sample|) so they reproduce bit-for-bit across
    engines and partitionings — the float-RMS variant would not.
    duration_ms uses integer division (n_frames*1000 DIV rate).
    Corrupt/unsupported payloads keep their error string instead of
    failing the stage. Fixed-width output; the payload column is
    dropped at this boundary."""

    def run(batches):
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "channels": [],
                "bits": [], "n_frames": [], "duration_ms": [],
                "sum_sq": [], "peak": [], "decode_err": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                try:
                    w = decode_wav(bytes(b or b""))
                    s = w["samples"].astype(np.int64)
                    rows["sample_rate"].append(w["sample_rate"])
                    rows["channels"].append(w["channels"])
                    rows["bits"].append(w["bits"])
                    rows["n_frames"].append(w["n_frames"])
                    rows["duration_ms"].append(
                        w["n_frames"] * 1000 // w["sample_rate"]
                    )
                    rows["sum_sq"].append(int(np.sum(s * s)))
                    rows["peak"].append(
                        int(np.max(np.abs(s))) if s.size else 0
                    )
                    rows["decode_err"].append(None)
                except (ValueError, NotImplementedError) as e:
                    for k in (
                        "sample_rate", "channels", "bits", "n_frames",
                        "duration_ms", "sum_sq", "peak",
                    ):
                        rows[k].append(None)
                    rows["decode_err"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "sample_rate": pd.array(rows["sample_rate"], dtype="Int32"),
                    "channels": pd.array(rows["channels"], dtype="Int32"),
                    "bits": pd.array(rows["bits"], dtype="Int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="Int64"),
                    "duration_ms": pd.array(rows["duration_ms"], dtype="Int64"),
                    "sum_sq": pd.array(rows["sum_sq"], dtype="Int64"),
                    "peak": pd.array(rows["peak"], dtype="Int32"),
                    "decode_err": rows["decode_err"],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_SCHEMA)
