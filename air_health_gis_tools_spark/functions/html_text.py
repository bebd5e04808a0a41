"""HTML → text extraction — the north_star's per-row webtext invariant.

The input-hint pages table carries both ``html:binary`` and ``text:string``
and requires *byte-identical extracted text per url* end-to-end. This module
IS that extraction operator: a batched Arrow kernel (``pandas_udf`` over the
binary/string column — no per-row Python at the Spark API surface)
implementing a deterministic extraction contract:

1. ``<script>`` / ``<style>`` / ``<template>`` elements drop with their
   contents (case-insensitive; raw-text scan to the first matching end tag,
   HTML5 CDATA-element semantics; unclosed → drop to end of input).
2. Comments ``<!-- … -->``, CDATA sections, ``<!…>`` declarations and
   ``<?…>`` processing instructions drop.
3. Remaining well-formed tags are removed; BLOCK-level tags (open, close or
   self-closing) emit a newline separator, inline tags emit nothing. A ``<``
   that does not open well-formed markup is literal text (HTML5 tokenizer
   behavior). Quoted attribute values may contain ``>`` (the tag scanner is
   quote-aware).
4. Character references decode per WHATWG rules *per text node* (stdlib
   ``html.unescape`` — the spec table + legacy no-semicolon algorithm — is
   shared data between engine and oracle; the independence claim is the
   tokenizer, not the entity table). Entities never span tag boundaries.
5. Whitespace normalization: each run of ASCII whitespace
   ``[ \\t\\r\\n\\f\\v]`` collapses to ``"\\n"`` if the run contains a
   newline else ``" "``; leading/trailing whitespace strips. ``&nbsp;``
   (U+00A0) is NOT whitespace and survives literally.

The independent oracle (tools/make_golden.py:golden_q54) implements the same
contract on stdlib ``html.parser.HTMLParser`` — an event-driven tokenizer,
a different algorithm from this module's regex scanner. Byte-agreement on
the deterministic pages fixture and on adversarial handcrafted documents is
asserted in tests/test_html_text.py.

Reference parity: the reference ingests pre-extracted point CSVs
(load_pm25_data.R:9-14 reads cleaned station tables); the extraction
invariant itself is the graft's webtext axis (BASELINE.json input_hint),
so this operator has no reference-file twin.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Elements whose boundaries separate text blocks (HTML5 flow-level set plus
# table structure; &nbsp;-style entities inside them are text, not markup).
BLOCK_TAGS = frozenset("""
    address article aside blockquote body br caption center dd details dialog
    div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head
    header hgroup hr html li main menu nav ol option p pre section select
    summary table tbody td tfoot th thead title tr ul
""".split())

# Raw-text elements: contents dropped wholesale (scan to first end tag).
_RAW = ("script", "style", "template")

_ATTRS = r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])*"  # quote-aware: '>' OK in quotes

_RAW_RE = re.compile(
    rf"(?is)<({'|'.join(_RAW)})\b{_ATTRS}>.*?</\1\s*>")
_RAW_OPEN_RE = re.compile(             # unclosed raw element: drop to EOF
    rf"(?is)<({'|'.join(_RAW)})\b{_ATTRS}>.*$")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_CDATA_RE = re.compile(r"(?s)<!\[CDATA\[.*?\]\]>")

# One scanner for everything that interrupts a text node: an element tag
# (group 2 = name), a declaration, or a processing instruction.
_MARKUP_RE = re.compile(
    rf"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*){_ATTRS}/?>"
    r"|<![^>]*>"
    r"|<\?[^>]*>")

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def _norm_ws(s: str) -> str:
    return _WS_RE.sub(lambda m: "\n" if "\n" in m.group(0) else " ",
                      s).strip(" \t\r\n\f\v")


def extract_text(html: str) -> str:
    """Extract visible text from one HTML document per the module contract."""
    s = _RAW_RE.sub("", html)
    s = _RAW_OPEN_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _CDATA_RE.sub("", s)
    parts: list[str] = []
    pos = 0
    for m in _MARKUP_RE.finditer(s):
        if m.start() > pos:
            parts.append(unescape(s[pos:m.start()]))
        name = m.group(2)
        if name is not None and name.lower() in BLOCK_TAGS:
            parts.append("\n")
        pos = m.end()
    if pos < len(s):
        parts.append(unescape(s[pos:]))
    return _norm_ws("".join(parts))


@F.pandas_udf(T.StringType())
def html_to_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction over an ``html`` binary or string column."""
    def _one(v):
        if v is None:
            return None
        if isinstance(v, (bytes, bytearray, memoryview)):
            v = bytes(v).decode("utf-8", "replace")
        return extract_text(v)
    return html.map(_one)
