"""Baseline JPEG (SOF0) codec: pure-stdlib encode/decode (round 6).

Two independent checks, mirroring the PNG suite's discipline:
  * a HAND-BUILT byte fixture (markers + entropy bits written out by
    hand from T.81) that the decoder must reproduce exactly — this pins
    the decoder against the spec independent of our own encoder;
  * closed-form round-trip oracles: a FLAT image's whole pipeline
    (RGB->YCbCr, FDCT DC, quantize, dequantize, IDCT, YCbCr->RGB, all
    with the codec's floor(x+0.5+eps) rounding) collapses to per-pixel
    arithmetic a test (and the DuckDB oracle in __spark_entry__) can
    recompute without touching the codec.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from ironspark.multimodal import (
    _JH_AC_LUM,
    _JH_DC_LUM,
    decode_image,
    decode_image_stage,
    decode_jpeg,
    encode_jpeg,
    image_dims,
)

EPS = 0.5 + 1e-9


def _r(x):
    return np.floor(np.asarray(x, dtype=np.float64) + EPS)


def _flat_expected(rr, gg, bb, quality):
    """Closed-form round trip of a flat RGB color through the codec
    (4:4:4): every block is DC-only, so quantization touches exactly
    one coefficient per plane and the output is one arithmetic chain."""
    sf = 5000 // quality if quality < 50 else 200 - 2 * quality
    q_lum = min(255, max(1, (16 * sf + 50) // 100))
    q_chr = min(255, max(1, (17 * sf + 50) // 100))
    y = float(np.clip(_r(0.299 * rr + 0.587 * gg + 0.114 * bb), 0, 255))
    cb = float(np.clip(_r(-0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0), 0, 255))
    cr = float(np.clip(_r(0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0), 0, 255))
    y2, cb2, cr2 = (
        float(np.clip(_r(_r(8.0 * (v - 128.0) / q) * q / 8.0 + 128.0), 0, 255))
        for v, q in ((y, q_lum), (cb, q_chr), (cr, q_chr))
    )
    out_r = int(np.clip(_r(y2 + 1.402 * (cr2 - 128.0)), 0, 255))
    out_g = int(
        np.clip(_r(y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)), 0, 255)
    )
    out_b = int(np.clip(_r(y2 + 1.772 * (cb2 - 128.0)), 0, 255))
    return out_r, out_g, out_b


@pytest.mark.parametrize("quality", [35, 49, 50, 75, 94])
def test_flat_rgb_roundtrip_matches_closed_form(quality):
    rng = np.random.default_rng(quality)
    for _ in range(4):
        rr, gg, bb = (int(v) for v in rng.integers(0, 256, 3))
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[..., 0], px[..., 1], px[..., 2] = rr, gg, bb
        img = decode_jpeg(encode_jpeg(px, quality=quality))
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        expect = _flat_expected(rr, gg, bb, quality)
        got = img["pixels"].reshape(-1, 3)
        assert (got == np.array(expect, dtype=np.uint8)).all(), (
            f"flat ({rr},{gg},{bb}) q={quality}: got {got[0]}, want {expect}"
        )


def test_flat_gray_roundtrip_matches_closed_form():
    for v, quality in [(0, 75), (37, 35), (128, 90), (192, 50), (255, 94)]:
        px = np.full((11, 13), v, dtype=np.uint8)
        img = decode_jpeg(encode_jpeg(px, quality=quality))
        sf = 5000 // quality if quality < 50 else 200 - 2 * quality
        q00 = min(255, max(1, (16 * sf + 50) // 100))
        expect = int(
            np.clip(_r(_r(8.0 * (v - 128.0) / q00) * q00 / 8.0 + 128.0), 0, 255)
        )
        assert img["channels"] == 1
        assert (img["pixels"] == expect).all()


def test_handbuilt_dc_only_fixture_decodes_exactly():
    """8x8 grayscale JPEG written out by hand (no encoder involved):
    flat q-table of 16s, Annex-K DC/AC luma Huffman tables, entropy
    stream = DC category 6 (code 1110) + mantissa 100000 (value 32)
    + EOB (code 1010), 1-padded to two bytes 0xE8 0x2B. Dequantized
    DC = 512, IDCT of a DC-only block = 512/8 + 128 = 192 everywhere."""
    dqt = b"\x00" + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_JH_DC_LUM[0]) + bytes(_JH_DC_LUM[1])
    dht_ac = bytes([0x10]) + bytes(_JH_AC_LUM[0]) + bytes(_JH_AC_LUM[1])
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    jpeg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + bytes([0xE8, 0x2B])
        + b"\xff\xd9"
    )
    img = decode_jpeg(jpeg)
    assert (img["width"], img["height"], img["channels"]) == (8, 8, 1)
    assert (img["pixels"] == 192).all()


def test_noise_roundtrip_error_bounds():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    img = decode_jpeg(encode_jpeg(px, quality=100))
    err = np.abs(img["pixels"].astype(int) - px.astype(int))
    assert err.max() <= 4  # q=100 keeps all quant steps tiny

    smooth = np.stack(
        np.meshgrid(np.arange(48) * 2 % 256, np.arange(32) * 3 % 256)
        + [np.zeros((32, 48)) + 77],
        axis=-1,
    ).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(smooth, quality=90))
    err = np.abs(img["pixels"].astype(int) - smooth.astype(int))
    assert err.mean() < 3.0


def test_subsample_420_and_restart_markers():
    # flat image survives 4:2:0 exactly (chroma average of a constant)
    px = np.empty((19, 26, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = 200, 40, 90
    payload = encode_jpeg(px, quality=75, subsample=True, restart_interval=1)
    assert b"\xff\xdd" in payload  # DRI present
    img = decode_jpeg(payload)
    assert (img["width"], img["height"]) == (26, 19)
    expect = _flat_expected(200, 40, 90, 75)
    assert (img["pixels"].reshape(-1, 3) == np.array(expect, np.uint8)).all()

    # noise through 4:2:0 + restarts: dims exact, luma error bounded
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, quality=92, subsample=True,
                                  restart_interval=2))
    y_in = _r(0.299 * noisy[..., 0] + 0.587 * noisy[..., 1] + 0.114 * noisy[..., 2])
    y_out = _r(0.299 * out["pixels"][..., 0].astype(float)
               + 0.587 * out["pixels"][..., 1].astype(float)
               + 0.114 * out["pixels"][..., 2].astype(float))
    assert np.abs(y_in - y_out).mean() < 4.0


def test_byte_stuffing_roundtrip():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    payload = encode_jpeg(px, quality=98)
    sos_at = payload.find(b"\xff\xda")
    assert b"\xff\x00" in payload[sos_at:]  # stuffing actually exercised
    img = decode_jpeg(payload)
    assert np.abs(img["pixels"].astype(int) - px.astype(int)).max() <= 8


def test_decoder_rejections():
    good = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), quality=75)

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive frame header (SOF2) is honest NotImplementedError
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)
    # 12-bit precision
    sof_at = good.find(b"\xff\xc0")
    twelve = bytearray(good)
    twelve[sof_at + 4] = 12
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(twelve))
    # truncated entropy stream dies loudly, not with a partial image
    rng = np.random.default_rng(2)
    big = encode_jpeg(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    sos_end = big.find(b"\xff\xda") + 12
    with pytest.raises(ValueError):
        decode_jpeg(big[: sos_end + (len(big) - sos_end) // 2])
    # missing EOI/garbage tail after full entropy data still decodes
    # (real crawled JPEGs are routinely truncated at the tail marker)
    img = decode_jpeg(good[:-2])
    assert img["width"] == 8


def test_decode_image_dispatches_jpeg_and_dims_agree():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (14, 31, 3), dtype=np.uint8)
    payload = encode_jpeg(px, quality=80)
    img = decode_image(payload)
    assert (img["width"], img["height"], img["channels"]) == (31, 14, 3)
    dims = image_dims(payload)
    assert dims == {"format": "jpeg", "width": 31, "height": 14}


def test_decode_image_stage_mixed_png_jpeg(spark):
    from tests.test_multimodal import PIX_2X2, make_png

    jpeg = encode_jpeg(np.full((9, 9, 3), 55, dtype=np.uint8), quality=85)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "payload": [
                    bytearray(make_png(PIX_2X2, ctype=2)),
                    bytearray(jpeg),
                    bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 "),
                ],
            }
        )
    )
    rows = {r.media_id: r for r in decode_image_stage(df).collect()}
    assert (rows[1].width, rows[1].height) == (2, 2)
    assert (rows[2].width, rows[2].height, rows[2].channels) == (9, 9, 3)
    assert rows[2].decode_err is None
    assert rows[3].width is None and "NotImplementedError" in rows[3].decode_err
