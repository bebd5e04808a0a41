"""HTML→text extraction: engine regex tokenizer vs stdlib-HTMLParser oracle
(two independent implementations of the functions/html_text.py contract),
plus the north_star byte-identity invariant over the pages fixture."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from air_health_gis_tools_spark.functions.html_text import (  # noqa: E402
    extract_text, html_to_text_udf)

CASES = [
    "<html><body>hello world</body></html>",
    "<p>a</p><p>b</p>",
    "plain text no tags",
    "a &amp; b &lt;div&gt; &#65;&#x42; &nbsp;end",
    "<div class=\"x>y\" data-z='1>2'>quoted attr</div>",
    "<script>var a = \"<div>not text</div>\";</script>after",
    "<STYLE>body { color: red }</STYLE>visible",
    "<!-- comment <b>bold</b> -->text",
    "<!DOCTYPE html><html><body>doc</body></html>",
    "math: a < b and c > d",
    "<ul><li>one</li><li>two</li></ul>",
    "<br>line1<br/>line2",
    "ends with unclosed <script>alert(1)",
    "<template><span>tpl</span></template>kept",
    "<h1>Title</h1>Body text <em>emph</em> more",
    "<table><tr><td>c1</td><td>c2</td></tr></table>",
    "entity no semi &amp stays? &ampx",
    "<a href=\"http://e.com/?a=1&amp;b=2\">link</a> tail",
    "   lots\t of \n\n whitespace   ",
    "<div>nested <div>inner</div> outer</div>",
    "<?xml version=\"1.0\"?><p>pi</p>",
    "unicode é中文 &eacute; &#x4e2d;",
    "<SCRIPT SRC=\"x.js\"></SCRIPT>tail2",
    "<p>broken tag at eof <div",
    # positional-order cases (ADVICE r3): construct openers nested inside
    # another construct's content must not win over the outer construct
    "<!-- <script> -->rest",
    "<!-- <style>x</style> -->kept <b>b</b>",
    "<script>a = \"<!--\"; x();</script>ok<!-- real -->",
    "<script>s</script><!-- <script>t</script> -->u",
    "a &am<!--x-->p; entity split by comment",
    "<!-- unterminated comment > recovers like HTMLParser",
    "<div>before<![CDATA[ <p>inside</p> ]]>after</div>",
    # r4 review: recovered bogus data is entity-decoded; self-closing raw
    # tags are startend tags, not raw-content openers
    "before <!--&amp; unterminated> after",
    "<![CDATA[&amp; open> rest",
    "a<script/>b</script>c",
    "x<style/>kept</style>y",
    "<script src='a'/>tail",
    "no gt <!--&amp; unterminated to eof",
]


def _stdlib():
    from make_golden import _StdlibExtractor
    return _StdlibExtractor()


@pytest.mark.parametrize("doc", CASES)
def test_engine_matches_stdlib_tokenizer(doc):
    assert extract_text(doc) == _stdlib().extract(doc)


def test_fuzz_fragments_agree():
    """Deterministic fuzz: documents assembled from fragment products keep
    the two tokenizers byte-identical."""
    frags = ["<p>", "</p>", "x &amp; y", "<b>z</b>", " <div>", "</div> ",
             "tail&#33;", "<br>", "a<b", "&quot;q&quot;", "\n", "<i>t",
             # r4 construct classes: comment openers/closers, self-closing
             # raw tags, CDATA, entities adjacent to bogus markup
             "<!--", "-->", "<script/>", "</script>",
             "<![CDATA[", "]]>", "&amp;"]
    ex = _stdlib()
    n = 0
    for i in range(len(frags)):
        for j in range(len(frags)):
            for k in range(len(frags)):
                doc = frags[i] + frags[j] + frags[k]
                assert extract_text(doc) == ex.extract(doc), repr(doc)
                n += 1
    assert n == len(frags) ** 3


def test_udf_binary_and_null(spark):
    df = spark.createDataFrame(
        [(1, b"<p>one</p>"), (2, None), (3, "<b>str input</b>".encode())],
        "id long, html binary")
    rows = {r["id"]: r["t"] for r in df.select(
        "id", html_to_text_udf(F.col("html")).alias("t")).collect()}
    assert rows == {1: "one", 2: None, 3: "str input"}


def test_pages_fixture_byte_identity(spark):
    """north_star invariant: extracted text == fixture text per url, for
    every page (the fixture html wraps text in <html><body>)."""
    from air_health_gis_tools_spark.plans.queries import q54_html_extract
    out = q54_html_extract(spark, "/root/testdata/sf0.001")
    agg = out.agg(F.count("*").alias("n"),
                  F.sum("byte_identical").alias("ok")).head()
    assert agg["n"] == 4096 and agg["ok"] == 4096


def test_golden_matches_engine(spark):
    """The committed golden parquet (stdlib tokenizer) row-matches the
    Spark result exactly — the driver's q54 comparison, replayed."""
    import pandas as pd
    golden = pd.read_parquet(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "golden", "q54_html_extract.parquet"))
    from air_health_gis_tools_spark.plans.queries import q54_html_extract
    got = (q54_html_extract(spark, "/root/testdata/sf0.001")
           .toPandas().sort_values("page_id").reset_index(drop=True))
    golden = golden.sort_values("page_id").reset_index(drop=True)
    assert (got["extracted"] == golden["extracted"]).all()
    assert (got["byte_identical"].to_numpy()
            == golden["byte_identical"].to_numpy()).all()
