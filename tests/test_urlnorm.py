"""URL canonicalization tests — functions/urlnorm.py (RFC 3986 §6)."""

from __future__ import annotations

from mitie_spark.functions.urlnorm import normalize_url


def test_scheme_host_case_and_default_ports():
    assert normalize_url("HTTP://Ex.COM:80/a") == "http://ex.com/a"
    assert normalize_url("HTTPS://EX.com:443/") == "https://ex.com/"
    # non-default port preserved
    assert normalize_url("http://ex.com:8080/a") == "http://ex.com:8080/a"
    # path case is NOT touched
    assert normalize_url("http://ex.com/CaseSensitive") == "http://ex.com/CaseSensitive"


def test_dot_segments():
    assert normalize_url("http://ex.com/a/./b/../c") == "http://ex.com/a/c"
    assert normalize_url("http://ex.com/../a") == "http://ex.com/a"
    assert normalize_url("http://ex.com/a/b/..") == "http://ex.com/a/"
    assert normalize_url("http://ex.com/a/.") == "http://ex.com/a/"
    assert normalize_url("http://ex.com") == "http://ex.com/"


def test_percent_encoding():
    # unreserved escapes decode; others uppercase their hex
    assert normalize_url("http://ex.com/%64oc%2Fx") == "http://ex.com/doc%2Fx"
    assert normalize_url("http://ex.com/a?%3a=%7e") == "http://ex.com/a?%3A=~"
    # lone/truncated % survives untouched
    assert normalize_url("http://ex.com/100%") == "http://ex.com/100%"


def test_fragment_userinfo_ipv6_idn():
    assert normalize_url("http://ex.com/a#frag") == "http://ex.com/a"
    assert (
        normalize_url("http://user:pw@EX.com:81/a")
        == "http://user:pw@ex.com:81/a"
    )
    assert normalize_url("http://[2001:DB8::1]:80/a") == "http://[2001:db8::1]/a"
    assert normalize_url("http://München.de/a") == "http://xn--mnchen-3ya.de/a"


def test_query_preserved_and_drop_params():
    u = "http://ex.com/a?b=2&a=1"
    assert normalize_url(u) == u  # never reordered
    assert normalize_url("http://ex.com/a?") == "http://ex.com/a"
    assert (
        normalize_url(
            "http://ex.com/a?utm_source=x&q=1&utm_medium=y",
            drop_params=("utm_source", "utm_medium"),
        )
        == "http://ex.com/a?q=1"
    )


def test_non_urls_pass_through():
    for junk in ("", "/relative/path", "not a url", "mailto:a@b.c"):
        assert normalize_url(junk) == junk
