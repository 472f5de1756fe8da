"""Regression pins for round-6 fixes (VERDICT/ADVICE r5)."""

import numpy as np
import pytest

from ironspark.multimodal import decode_wav, encode_wav
from ironspark.robots import parse_robots_txt


# -- RFC 9309 §2.2.1 exact UA-token group matching (VERDICT r5 #2) ----------

PREFIX_TRAP = """
User-agent: iron
Disallow: /iron-only/
Crawl-delay: 9

User-agent: *
Disallow: /everyone/
Crawl-delay: 2
"""


def test_ua_exact_match_does_not_adopt_prefix_group():
    # agent "ironspark" must NOT adopt the "iron" group (prefix match
    # would); strict RFC assigns that group to a different crawler
    delay, dis, _ = parse_robots_txt(PREFIX_TRAP, agent="ironspark")
    assert delay == 2.0
    assert dis == ["/everyone/"]


def test_ua_exact_match_still_selects_own_group():
    delay, dis, _ = parse_robots_txt(PREFIX_TRAP, agent="iron")
    assert delay == 9.0
    assert dis == ["/iron-only/"]


def test_ua_exact_match_case_insensitive():
    delay, dis, _ = parse_robots_txt(
        "User-agent: IronSpark\nDisallow: /mine/", agent="ironspark"
    )
    assert dis == ["/mine/"]


def test_ua_duplicate_groups_merge():
    txt = (
        "User-agent: ironspark\nDisallow: /a/\n\n"
        "User-agent: ironspark\nDisallow: /b/\n"
    )
    _, dis, _ = parse_robots_txt(txt, agent="ironspark")
    assert sorted(dis) == ["/a/", "/b/"]


# -- truncated-WAV detection (ADVICE r5) -------------------------------------

def test_decode_wav_raises_on_truncated_data_chunk():
    full = encode_wav(np.arange(100, dtype=np.int16), sample_rate=8000)
    truncated = full[:-40]  # data chunk now declares more than remains
    with pytest.raises(ValueError, match="truncated data chunk"):
        decode_wav(truncated)


def test_decode_wav_complete_file_still_decodes():
    full = encode_wav(np.arange(100, dtype=np.int16), sample_rate=8000)
    out = decode_wav(full)
    assert out["n_frames"] == 100 and out["sample_rate"] == 8000
