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
