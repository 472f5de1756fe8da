"""GIF (LZW) + BMP codecs: pure-stdlib encode/decode (round 6).

Same discipline as the PNG/JPEG suites: the decoder is pinned by a
HAND-BUILT byte fixture whose LZW stream is packed by a test-side
spec implementation (literal codes separated by clear codes — the
classic "uncompressed GIF" construction, valid per GIF89a Appendix F
and independent of our encoder), plus lossless round trips through the
real encoder for palettes up to 256 colors, interlace, dictionary
resets, and the BMP 24-bit/8-bit/top-down/padding variants.
"""

import struct

import numpy as np
import pytest

from ironspark.multimodal import (
    decode_bmp,
    decode_gif,
    decode_image,
    encode_bmp,
    encode_gif,
    image_dims,
)


def _pack_codes(codes, width):
    """LSB-first fixed-width code packer (spec Appendix F bit order).
    Callers keep the dictionary small (clear after every literal) so
    the width never grows — an independent forward implementation."""
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _handmade_gif(idx_rows, palette, min_code=2):
    """Build a complete GIF89a by hand: literal LZW codes with a clear
    code before every literal (dictionary never grows past end+1, so
    the code width stays min_code+1 throughout)."""
    h = len(idx_rows)
    w = len(idx_rows[0])
    clear = 1 << min_code
    codes = []
    for row in idx_rows:
        for v in row:
            codes += [clear, v]
    codes.append(clear + 1)  # end
    data = _pack_codes(codes, min_code + 1)
    n = 2 << 1  # 4-entry color table
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += bytes(3 * (n - len(palette)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x01, 0, 0])  # GCT present, 4 entries
    out += pal
    # a graphic-control extension the decoder must skip
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


PAL4 = [(10, 20, 30), (200, 0, 50), (0, 255, 0), (7, 7, 7)]


def test_handmade_gif_fixture_decodes_exactly():
    idx = [[0, 1, 2], [3, 2, 1]]
    img = decode_gif(_handmade_gif(idx, PAL4))
    assert (img["width"], img["height"], img["channels"]) == (3, 2, 3)
    want = np.array(PAL4, dtype=np.uint8)[np.array(idx)]
    assert (img["pixels"] == want).all()


def test_gif_roundtrip_palettes_and_interlace():
    rng = np.random.default_rng(3)
    for shape, ncol, inter in [
        ((7, 9), 4, False), ((16, 16), 16, False),
        ((23, 5), 7, True), ((64, 64), 256, False), ((1, 1), 2, False),
        ((9, 4), 5, True),
    ]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, shape, dtype=np.uint8)
        img = decode_gif(encode_gif(idx, pal, interlace=inter))
        assert (img["width"], img["height"]) == (shape[1], shape[0])
        assert (img["pixels"] == pal[idx]).all(), (shape, ncol, inter)


def test_gif_dictionary_reset_at_4096():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 256, (200, 300), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    img = decode_gif(payload)
    assert (img["pixels"] == pal[idx]).all()
    # image_dims agrees without a decode
    assert image_dims(payload) == {"format": "gif", "width": 300, "height": 200}


def test_gif_rejections():
    good = encode_gif(
        np.zeros((4, 4), dtype=np.uint8), np.array(PAL4, dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated inside the color table/blocks
    # trailer with no image descriptor
    with pytest.raises(ValueError):
        decode_gif(good[:13] + good[13 : 13 + 12] + b"\x3b")
    # entropy stream cut mid-image
    sub_at = good.find(b"\x2c")
    with pytest.raises(ValueError):
        decode_gif(good[: sub_at + 12])


def test_bmp_roundtrips_and_padding():
    rng = np.random.default_rng(6)
    for shape, td in [((5, 7), False), ((12, 3), True), ((1, 4), False),
                      ((8, 8), False), ((3, 1), True)]:
        px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        img = decode_bmp(encode_bmp(px, top_down=td))
        assert (img["width"], img["height"]) == (shape[1], shape[0])
        assert (img["pixels"] == px).all(), (shape, td)


def test_bmp_8bit_palette_handmade():
    # hand-built 8-bit BMP: 2x2 bottom-up, 2-entry palette (stored BGRX)
    pal = b"\x30\x20\x10\x00" + b"\x32\x00\xc8\x00"  # ->RGB (16,32,48),(200,0,50)
    # rows padded to 4 bytes; bottom-up: file row 0 = image row 1
    rows = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 8 + len(rows), 0, 0, 14 + 40 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(rows),
                       2835, 2835, 2, 2)
    img = decode_bmp(hdr + info + pal + rows)
    want = np.array(
        [[[16, 32, 48], [200, 0, 50]], [[200, 0, 50], [16, 32, 48]]],
        dtype=np.uint8,
    )
    assert (img["pixels"] == want).all()


def test_bmp_rejections():
    good = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(b"XX not a bmp at all, way too short")
    with pytest.raises(ValueError):
        decode_bmp(good[:-3])  # truncated pixel data
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))
    bpp16 = bytearray(good)
    bpp16[28] = 16
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bpp16))


def test_decode_image_dispatches_gif_and_bmp():
    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (6, 11), dtype=np.uint8)
    g = decode_image(encode_gif(idx, pal))
    assert (g["width"], g["height"], g["channels"]) == (11, 6, 3)
    px = rng.integers(0, 256, (4, 9, 3), dtype=np.uint8)
    b = decode_image(encode_bmp(px))
    assert (b["pixels"] == px).all()
