"""Multimodal: real PNG decode (pure stdlib) + Spark decode stage.

The test-side ``make_png`` encoder applies the PNG §9 filters FORWARD
independently of the library; ``decode_png`` must invert them
byte-exactly — a round-trip cross-check, not a shared-code tautology.
"""

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from ironspark.multimodal import decode_image, decode_image_stage, decode_png


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype, line, prev, bpp):
    """Forward PNG filter (spec §9) — the encoder side."""
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
    return bytes(out)


def make_png(pixels: np.ndarray, ctype: int, filters=None, plte=None) -> bytes:
    h, w, c = pixels.shape
    bpp = c
    filters = filters if filters is not None else [0] * h
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w * c)
    for y in range(h):
        line = pixels[y].tobytes()
        raw += bytes([filters[y]]) + _filter_row(filters[y], line, prev, bpp)
        prev = line
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return out


PIX_2X2 = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
)


def test_decode_2x2_rgb_byte_exact():
    png = make_png(PIX_2X2, ctype=2)
    img = decode_png(png)
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"].tobytes() == PIX_2X2.tobytes()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_inverts_every_filter(ftype):
    rng = np.random.RandomState(7 + ftype)
    pix = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = make_png(pix, ctype=2, filters=[ftype] * 5)
    assert decode_png(png)["pixels"].tobytes() == pix.tobytes()


def test_decode_mixed_filters_and_modes():
    rng = np.random.RandomState(42)
    # mixed filters exercise the cross-row (Up/Average/Paeth) recurrence
    pix = rng.randint(0, 256, size=(6, 3, 4), dtype=np.uint8)  # RGBA
    png = make_png(pix, ctype=6, filters=[0, 1, 2, 3, 4, 2])
    img = decode_png(png)
    assert img["channels"] == 4
    assert img["pixels"].tobytes() == pix.tobytes()
    # grayscale
    g = rng.randint(0, 256, size=(3, 5, 1), dtype=np.uint8)
    assert decode_png(make_png(g, ctype=0))["pixels"].tobytes() == g.tobytes()
    # gray+alpha
    ga = rng.randint(0, 256, size=(2, 2, 2), dtype=np.uint8)
    assert decode_png(make_png(ga, ctype=4))["pixels"].tobytes() == ga.tobytes()


def test_decode_palette_expands_to_rgb():
    plte = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    idx = np.array([[[0], [1]], [[1], [0]]], dtype=np.uint8)
    img = decode_png(make_png(idx, ctype=3, plte=plte))
    assert img["channels"] == 3
    expect = plte[idx[:, :, 0]]
    assert img["pixels"].tobytes() == expect.tobytes()


def test_decode_rejects_unsupported_and_garbage():
    # a JPEG SOI with a malformed marker stream routes to decode_jpeg
    # (real since round 6) and dies as malformed, not unsupported;
    # same for a truncated GIF; containers with no built-in codec
    # (webp) stay honest NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a no pixel data")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    # 16-bit depth: honest NotImplementedError, not a wrong answer
    png16 = bytearray(make_png(PIX_2X2, ctype=2))
    ihdr_off = png16.find(b"IHDR") + 4
    png16[ihdr_off + 8] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(png16))


def test_decode_image_stage_distributed(spark):
    png = make_png(PIX_2X2, ctype=2)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "payload": [bytearray(png), bytearray(b"garbage"), None],
            }
        )
    )
    rows = {r.media_id: r for r in decode_image_stage(df).collect()}
    ok = rows[1]
    assert (ok.width, ok.height, ok.channels) == (2, 2, 3)
    assert ok.pixel_digest == hashlib.md5(PIX_2X2.tobytes()).hexdigest()
    assert ok.decode_err is None
    assert rows[2].width is None and "NotImplementedError" in rows[2].decode_err
    assert rows[3].decode_err is not None  # empty payload -> error row


def test_encode_png_matches_independent_encoder_and_roundtrips():
    from ironspark.multimodal import encode_png

    rng = np.random.RandomState(99)
    pix = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8)
    filters = [0, 1, 3, 4]
    lib = encode_png(pix, filters=filters)
    ref = make_png(pix, ctype=2, filters=filters)
    assert lib == ref  # byte-identical to the test-side encoder
    assert decode_png(lib)["pixels"].tobytes() == pix.tobytes()
    # gray and RGBA channel mapping
    g = rng.randint(0, 256, size=(2, 2, 1), dtype=np.uint8)
    assert decode_png(encode_png(g))["channels"] == 1
    rgba = rng.randint(0, 256, size=(2, 2, 4), dtype=np.uint8)
    assert decode_png(encode_png(rgba))["pixels"].tobytes() == rgba.tobytes()


def test_image_dims_headers():
    """Header-only dims for PNG/JPEG/GIF/BMP from hand-built minimal
    containers (ITU T.81 / GIF89a / BITMAPINFOHEADER layouts)."""
    from ironspark.multimodal import image_dims

    # PNG via our own encoder
    png = make_png(np.zeros((3, 7, 3), dtype=np.uint8), ctype=2)
    assert image_dims(png) == {"format": "png", "width": 7, "height": 3}

    # minimal JPEG: SOI, APP0 (len 4), DQT-ish skip seg, SOF0, EOI
    jpeg = (
        b"\xff\xd8"                       # SOI
        + b"\xff\xe0" + (4).to_bytes(2, "big") + b"\x00\x00"   # APP0
        + b"\xff\xdb" + (5).to_bytes(2, "big") + b"\x00\x00\x00"  # DQT
        + b"\xff\xc0" + (11).to_bytes(2, "big")  # SOF0, len 11
        + b"\x08" + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03\x01\x11\x00"
        + b"\xff\xd9"                      # EOI
    )
    assert image_dims(jpeg) == {"format": "jpeg", "width": 640, "height": 480}
    # restart markers / fill bytes before SOF are skipped
    jpeg2 = b"\xff\xd8\xff\xff" + b"\xff\xd0" + jpeg[2:]
    assert image_dims(jpeg2)["width"] == 640

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 3
    assert image_dims(gif) == {"format": "gif", "width": 320, "height": 200}

    bmp = (
        b"BM" + b"\x00" * 16
        + (1024).to_bytes(4, "little")
        + (-768).to_bytes(4, "little", signed=True)  # top-down BMP
    )
    assert image_dims(bmp) == {"format": "bmp", "width": 1024, "height": 768}

    with pytest.raises(ValueError):
        image_dims(b"not an image")
    with pytest.raises(ValueError):
        image_dims(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")  # no SOF
    with pytest.raises(ValueError):
        image_dims(b"GIF89a\x01")  # truncated


# -- WAV codec (round 5) ---------------------------------------------------


def test_wav_roundtrip_against_stdlib_wave():
    """Our encoder must be readable by the stdlib wave module and our
    decoder must read stdlib-written files byte-exactly."""
    import io
    import wave as stdwave

    import numpy as np

    from ironspark.multimodal import decode_wav, encode_wav

    s = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    payload = encode_wav(s, sample_rate=22050)

    # stdlib reads ours
    with stdwave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == len(s)
        assert np.frombuffer(w.readframes(len(s)), dtype="<i2").tolist() == s.tolist()

    # ours reads stdlib's
    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        stereo = np.array([[1, -1], [300, -300]], dtype="<i2")
        w.writeframes(stereo.tobytes())
    out = decode_wav(buf.getvalue())
    assert (out["sample_rate"], out["channels"], out["bits"]) == (8000, 2, 16)
    assert out["samples"].tolist() == stereo.tolist()


def test_wav_decode_edge_cases():
    import numpy as np
    import pytest

    from ironspark.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a wav")
    # odd-sized unknown chunk before data must be skipped word-aligned
    s = np.array([5, -5, 9], dtype=np.int16)
    good = encode_wav(s, sample_rate=8000)
    fmt_end = 12 + 8 + 16
    injected = (
        good[:fmt_end]
        + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"  # 3-byte chunk + pad
        + good[fmt_end:]
    )
    assert decode_wav(injected)["samples"].ravel().tolist() == [5, -5, 9]
    # non-PCM format code -> NotImplementedError, not a crash
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad_fmt))


def test_wav_8bit_recentered():
    import struct

    from ironspark.multimodal import decode_wav, _WAV_FMT

    data = bytes([0, 128, 255])  # unsigned 8-bit: min, mid, max
    fmt = _WAV_FMT.pack(1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_wav(payload)
    assert out["bits"] == 8
    assert out["samples"].ravel().tolist() == [-128, 0, 127]


def test_audio_stats_stage_distributed(spark):
    import numpy as np

    from ironspark.multimodal import audio_stats_stage, encode_wav

    rows = [
        (1, bytearray(encode_wav(np.array([3, -4], dtype=np.int16), 1000))),
        (2, bytearray(b"corrupt payload")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_stats_stage(media).collect()}
    r1 = out[1]
    assert (r1["n_frames"], r1["sum_sq"], r1["peak"]) == (2, 25, 4)
    assert r1["duration_ms"] == 2 * 1000 // 1000
    assert r1["decode_err"] is None
    # corrupt rows survive with an error string, never kill the stage
    assert out[2]["decode_err"].startswith("ValueError")
    assert out[2]["sum_sq"] is None
