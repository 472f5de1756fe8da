"""Animated-GIF demux + compositing (multimodal.decode_gif_frames /
encode_gif_animation / gif_frame_sample_stage, round 6).

Reference parity note: the reference engine treats media payloads as
opaque bytes (it never decodes images); these codecs are the
curation-pipeline extension the brief asks for, spec'd against the
public GIF89a document (CompuServe 1990) + the de-facto NETSCAPE2.0
looping block, not against reference code.
"""

import numpy as np
import pytest

from ironspark.multimodal import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
    gif_frame_sample_stage,
)

PAL = np.array(
    [[10, 20, 30], [40, 50, 60], [70, 80, 90], [200, 210, 220]],
    dtype=np.uint8,
)


def test_single_frame_animation_matches_decode_gif():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    anim = encode_gif_animation([idx], PAL)
    out = decode_gif_frames(anim)
    assert out["n_frames"] == 1
    assert (out["frames"][0]["pixels"] == decode_gif(encode_gif(idx, PAL))["pixels"]).all()


def test_transparency_reveals_previous_frame():
    frames = [
        np.array([[0, 1], [2, 3]], dtype=np.uint8),
        np.array([[3, 3], [1, 0]], dtype=np.uint8),  # 3 = transparent
    ]
    anim = encode_gif_animation(
        frames, PAL, delays_cs=[5, 7], transparents=[None, 3]
    )
    out = decode_gif_frames(anim)
    f0, f1 = (f["pixels"] for f in out["frames"])
    assert (f0 == PAL[frames[0]]).all()
    # row 0 keeps frame 0's pixels (transparent), row 1 is overwritten
    expected = PAL[np.array([[0, 1], [1, 0]])]
    assert (f1 == expected).all()
    assert [f["delay_cs"] for f in out["frames"]] == [5, 7]


def test_disposal_2_restores_background():
    # bg index is 0 in the encoder's LSD, so after a disposal-2 frame
    # the NEXT frame composites over PAL[0], not over the old pixels
    frames = [
        np.array([[1, 1], [1, 1]], dtype=np.uint8),
        np.array([[2]], dtype=np.uint8),  # 1x1 sub-rect at (1,1)
        np.array([[3, 3], [3, 3]], dtype=np.uint8),  # all transparent
    ]
    anim = encode_gif_animation(
        frames, PAL,
        transparents=[None, None, 3],
        disposals=[2, 1, 1],
        rects=[(0, 0), (1, 1), (0, 0)],
    )
    out = decode_gif_frames(anim)
    f1, f2 = out["frames"][1]["pixels"], out["frames"][2]["pixels"]
    # frame 1: disposal-2 of frame 0 cleared the canvas to bg
    assert (f1[0, 0] == PAL[0]).all()
    assert (f1[1, 1] == PAL[2]).all()
    # frame 2 is fully transparent: identical to the frame-1 composite
    assert (f2 == f1).all()


def test_disposal_3_restores_previous_canvas():
    frames = [
        np.array([[0, 0], [0, 0]], dtype=np.uint8),
        np.array([[2]], dtype=np.uint8),  # restore-previous sub-rect
        np.array([[3, 3], [3, 3]], dtype=np.uint8),  # transparent probe
    ]
    anim = encode_gif_animation(
        frames, PAL,
        transparents=[None, None, 3],
        disposals=[1, 3, 1],
        rects=[(0, 0), (1, 1), (0, 0)],
    )
    out = decode_gif_frames(anim)
    # frame 1 shows the overlay...
    assert (out["frames"][1]["pixels"][1, 1] == PAL[2]).all()
    # ...but frame 2 (all transparent) shows the RESTORED canvas
    assert (out["frames"][2]["pixels"] == PAL[0]).all()


def test_max_frames_stops_early():
    frames = [np.full((2, 2), k % 4, dtype=np.uint8) for k in range(6)]
    anim = encode_gif_animation(frames, PAL)
    assert decode_gif_frames(anim, max_frames=2)["n_frames"] == 2
    assert decode_gif_frames(anim)["n_frames"] == 6


def test_netscape_loop_block_is_skipped_and_present():
    anim = encode_gif_animation([np.zeros((1, 1), dtype=np.uint8)], PAL)
    assert b"NETSCAPE2.0" in anim
    no_loop = encode_gif_animation(
        [np.zeros((1, 1), dtype=np.uint8)], PAL, loop=False
    )
    assert b"NETSCAPE2.0" not in no_loop
    assert decode_gif_frames(anim)["n_frames"] == 1


def test_frame_rect_outside_screen_rejected():
    with pytest.raises(ValueError):
        encode_gif_animation(
            [np.zeros((2, 2), dtype=np.uint8),
             np.zeros((2, 2), dtype=np.uint8)],
            PAL, rects=[(0, 0), (1, 1)],
        )
    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF89a no frames")


def test_truncated_animation_raises():
    frames = [np.array([[0, 1], [2, 3]], dtype=np.uint8)] * 2
    anim = encode_gif_animation(frames, PAL)
    with pytest.raises(ValueError):
        decode_gif_frames(anim[: len(anim) - 10] )


def test_frame_sample_stage_distributed(spark):
    import pandas as pd

    def build(batches):
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid == 99:
                    payloads.append(b"GIF89a broken")
                else:
                    frames = [
                        np.full((2, 2), (mid + f) % 4, dtype=np.uint8)
                        for f in range(4)
                    ]
                    payloads.append(encode_gif_animation(
                        frames, PAL, delays_cs=[f + 1 for f in range(4)]
                    ))
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = spark.range(0, 4).toDF("media_id").union(
        spark.createDataFrame([(99,)], "media_id long")
    ).mapInPandas(build, "media_id long, payload binary")

    got = gif_frame_sample_stage(media, every_n=2).toPandas()
    ok = got[got["err"].isna()]
    bad = got[got["err"].notna()]
    # 4 good animations x frames {0, 2} sampled
    assert len(ok) == 8
    assert sorted(ok["frame_idx"].unique().tolist()) == [0, 2]
    assert set(ok["delay_cs"]) == {1, 3}
    row = ok[(ok["media_id"] == 1) & (ok["frame_idx"] == 2)].iloc[0]
    assert row["px_hex"] == PAL[np.full((2, 2), 3)].tobytes().hex()
    # the malformed payload came back as one err row, not a task failure
    assert len(bad) == 1 and bad.iloc[0]["media_id"] == 99
    assert "ValueError" in bad.iloc[0]["err"]
