"""URL canonicalization tests (SURVEY.md §2.4 P8; north-rule spec)."""

from ironspark.url import canonicalize_url, host_of


def test_scheme_host_lowercase():
    assert canonicalize_url("HTTP://ExAmple.COM/Path") == "http://example.com/Path"


def test_default_port_dropped():
    assert canonicalize_url("http://h.com:80/a") == "http://h.com/a"
    assert canonicalize_url("https://h.com:443/a") == "https://h.com/a"
    assert canonicalize_url("http://h.com:8080/a") == "http://h.com:8080/a"


def test_fragment_stripped():
    assert canonicalize_url("http://h.com/a#frag") == "http://h.com/a"


def test_query_params_sorted():
    assert canonicalize_url("http://h.com/a?b=2&a=1") == "http://h.com/a?a=1&b=2"
    assert canonicalize_url("http://h.com/a?z=1&z=0") == "http://h.com/a?z=0&z=1"


def test_percent_decode_unreserved():
    # %7E is unreserved '~' -> decoded; space stays encoded (uppercase hex)
    assert canonicalize_url("http://h.com/%7Euser") == "http://h.com/~user"
    assert canonicalize_url("http://h.com/a%20b") == "http://h.com/a%20b"
    assert canonicalize_url("http://h.com/a%2fb") == "http://h.com/a%2Fb"


def test_empty_path_becomes_slash():
    assert canonicalize_url("http://h.com") == "http://h.com/"


def test_dot_segments_removed():
    assert canonicalize_url("http://h.com/a/./b/../c") == "http://h.com/a/c"
    assert canonicalize_url("http://h.com/a/b/") == "http://h.com/a/b/"


def test_invalid_inputs_none():
    assert canonicalize_url(None) is None
    assert canonicalize_url("not a url") is None
    assert canonicalize_url("relative/path") is None
    assert canonicalize_url("http://h.com:notaport/") is None


def test_idempotent():
    u = "HTTP://H.com:80/%7Ea/./b?z=1&a=2#f"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_host_of():
    assert host_of("http://WWW.Example.com:8080/x") == "www.example.com"
    assert host_of("nonsense") is None
    assert host_of(None) is None


# -- fast-path parity (canonicalize_url/host_of vs the spec bodies) ----------

def test_fast_path_parity():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ironspark.url import (
        _FAST_CANON_RE,
        canonicalize_url_spec,
        host_of_spec,
    )

    fixed = [
        "http://h0001.example.com/page/123",
        "http://mega.example.com/page/0",
        "http://c0.example.com:5000/article/4",
        "http://h.com:80/x",        # default port: slow path must fire
        "https://h.com:443/x",
        "http://h.com:080/x",       # leading-zero port
        "http://h.com//double//slash",
        "http://h.com/",
        "http://h.com",             # empty path
        "http://h.com/a/./b",       # dot segment
        "http://h.com/a.html",      # '.' in path (excluded from fast)
        "http://h.com/%7Ea",
        "http://u:p@h.com/x",       # userinfo
        "http://h.com/x?b=1&a=2",
        "http://h.com/x#frag",
        "HTTP://H.com/X",
        "http://h.com./x",          # trailing-dot host
        "http://h.com:5000/x",
        "http://h.com:0/x",
    ]
    for u in fixed:
        assert canonicalize_url(u) == canonicalize_url_spec(u), u
        assert host_of(u) == host_of_spec(u), u

    url_chars = "abzAZ09-._~%/:?#@&=+ 'é"

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=url_chars, max_size=25))
    def rand(tail):
        for u in ("http://" + tail, "https://h.com" + tail, tail):
            assert canonicalize_url(u) == canonicalize_url_spec(u), u
            assert host_of(u) == host_of_spec(u), u

    rand()

    # every fast-path hit must be a spec fixed point
    @settings(max_examples=300, deadline=None)
    @given(
        st.from_regex(
            r"http://[a-z0-9-]{1,8}(\.[a-z0-9-]{1,6}){0,2}(:[1-9][0-9]{0,3})?"
            r"/[A-Za-z0-9_~/-]{0,12}",
            fullmatch=True,
        )
    )
    def fixpoint(u):
        if _FAST_CANON_RE.match(u):
            assert canonicalize_url_spec(u) == u or (
                (u.split("//")[1].split("/")[0].endswith(":80"))
            ), u

    fixpoint()
