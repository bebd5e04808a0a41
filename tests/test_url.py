"""URL canonicalization kernel (functions/url.py) vs RFC 3986 examples and
the spec-constructed q56 oracle."""

from __future__ import annotations

import duckdb
import pytest

from air_health_gis_tools_spark.functions.url import (canonicalize_url,
                                                      remove_dot_segments)

# RFC 3986 §5.2.4 + merge examples
DOT_CASES = [
    ("/a/b/c/./../../g", "/a/g"),
    ("mid/content=5/../6", "mid/6"),
    ("/a/./b", "/a/b"),
    ("/a/../b", "/b"),
    ("/x/../../y", "/y"),
    ("/.", "/"),
    ("/..", "/"),
    ("/a/b/..", "/a/"),
    ("/a/b/.", "/a/b/"),
    ("//keep//empty", "//keep//empty"),
]


@pytest.mark.parametrize("raw,expect", DOT_CASES)
def test_remove_dot_segments(raw, expect):
    assert remove_dot_segments(raw) == expect


URL_CASES = [
    ("HTTP://Example.COM/", ("http://example.com/", "example.com")),
    ("https://e.com:443/a", ("https://e.com/a", "e.com")),
    ("http://e.com:80/a", ("http://e.com/a", "e.com")),
    ("http://e.com:8080/a", ("http://e.com:8080/a", "e.com")),
    ("http://e.com", ("http://e.com/", "e.com")),
    ("http://e.com/%7euser/%2fx", ("http://e.com/~user/%2Fx", "e.com")),
    ("http://e.com/a?utm_source=x&b=1&gclid=z#f",
     ("http://e.com/a?b=1", "e.com")),
    ("http://e.com/a?utm_source=x", ("http://e.com/a", "e.com")),
    ("http://e.com/a?", ("http://e.com/a", "e.com")),
    ("http://u:p@e.com/x", ("http://u:p@e.com/x", "u:p@e.com")),
    ("mailto:a@b.c", ("mailto:a@b.c", "")),
    ("not a url", ("not a url", "")),
    ("http://[::1]:8080/x", ("http://[::1]:8080/x", "[::1]:8080")),
]


@pytest.mark.parametrize("raw,expect", URL_CASES)
def test_canonicalize_cases(raw, expect):
    assert canonicalize_url(raw) == expect


def test_q56_matches_spec_oracle(spark, duck):
    """Engine normalizes the messy URL; the oracle constructs the expected
    canonical form directly from doc_id — full-row agreement."""
    from air_health_gis_tools_spark.plans.queries import (q56_sql,
                                                          q56_url_canonicalize)
    got = (q56_url_canonicalize(spark, "/root/testdata/sf0.001")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    exp = (duck.execute(q56_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["url_norm"] == exp["url_norm"]).all()
    assert (got["host"] == exp["host"]).all()
