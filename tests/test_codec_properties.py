"""Property-based hardening of the webtext codecs (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from air_health_gis_tools_spark.functions.html_text import extract_text
from air_health_gis_tools_spark.functions.url import canonicalize_url
from air_health_gis_tools_spark.sources.warc import (http_response_block,
                                                     parse_warc_bytes,
                                                     split_http_response,
                                                     write_warc_record)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_warc_block_roundtrip_arbitrary_bytes(block):
    """ANY byte payload round-trips (Content-Length framing: embedded
    CRLFCRLF, WARC/ prefixes or gzip magic inside the block are data)."""
    rec = write_warc_record("response", "https://e.x/p",
                            "2021-01-01T00:00:00Z", "r", block)
    out = list(parse_warc_bytes(rec + rec))
    assert len(out) == 2
    assert out[0]["block"] == block == out[1]["block"]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=1024),
       st.integers(min_value=100, max_value=599))
def test_http_block_roundtrip(body, status):
    s, ct, b = split_http_response(
        http_response_block(body, status=status, content_type="a/b"))
    assert (s, ct, b) == (status, "a/b", body)


_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~%/?&=#:@+ ", min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(["http", "https", "HTTP"]),
       st.sampled_from(["E.com", "e.com:443", "e.com:80", "e.com:8080",
                        "u:p@E.com", "[::1]:9", "e.com."]),
       _URL_CHARS)
def test_url_canonicalize_idempotent(scheme, authority, tail):
    """canonicalize∘canonicalize == canonicalize — the frontier identity
    must be a fixed point or dedup keys drift between crawls."""
    u = f"{scheme}://{authority}/{tail}"
    once, host1 = canonicalize_url(u)
    twice, host2 = canonicalize_url(once)
    assert twice == once
    assert host2 == host1


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc XY01.,!\t\n", min_size=0, max_size=200))
def test_extract_text_plain_is_whitespace_norm(s):
    """Markup-free text (no '<'/'&') extracts to its whitespace
    normalization — the byte-identity base case."""
    from air_health_gis_tools_spark.functions.html_text import _norm_ws
    assert extract_text(s) == _norm_ws(s)


def test_geohash_engine_vs_independent_scalar():
    """Vectorized engine encoder vs the golden's scalar interval walker
    over a deterministic sweep (the q61 independence pair, magnified)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from make_golden import _geohash_scalar

    from air_health_gis_tools_spark.functions.geohash import \
        geohash_encode_np
    rng = np.random.default_rng(11)
    lat = rng.uniform(-90, 90, 500)
    lng = rng.uniform(-180, 180, 500)
    got = geohash_encode_np(lat, lng, 10)
    for a, b, g in zip(lat, lng, got):
        assert g == _geohash_scalar(float(a), float(b), 10)
