"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship buffered-zonal-stats pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (95
queries in r5, incl. icosahedral H3 q49/q52, the two-CRS srg-dev workflow
q50, the geocode→CRS→pixel chain q51, the curation-pipeline q53, the
webtext ingest surface — HTML→text extraction q54, WARC ingest q55, URL
canonicalization q56, as-of join q57, repetition signals q58 — plus
IVF-PQ ANN q59, spec-pinned web tile indexes q60/q61 (slippy+quadkey,
geohash with published vectors), BM25 scoring q62 and event
sessionization q63, salted skew-defense rollup q64, Z-order layout keys q65, overview-pyramid stats on the real raster q66, exact fixed-point PageRank q67, dedup connected components q68, ROLLUP grouping sets q69, decontamination anti-join q70, exact percentiles q71, edit-distance pair verify q72, the collapsed-dedup-groups composition q73,
approx-percentile contract q74, range/interval joins q75/q77, winnowing
fingerprints q76, HLL distinct-count contract q78, time-grid gap fill q79,
TF-IDF top-k q80, Bloom-filter decontamination q81, PII scan q82, triangle
counts on the candidate graph q83, SemDeDup semantic dedup q84,
domain-mixture resampling q85, Count-Min heavy hitters q86,
contamination-span islands q87, retention cohorts q88, SCD2 validity
intervals q89, sequence packing q90, PMI term pairs q91, passage-level
dedup q92, bigram LM surprise q93, sample-trained BPE tokenization q94,
deterministic shard shuffle q95);
``oracle_sql()`` pairs EVERY query with a DuckDB oracle (all floating
outputs are engineered to be bit-identical across engines — see
air_health_gis_tools_spark/geo_synth.py). There are no rows-only
queries left: the non-SQL-expressible rows (q23, q24, q30, q31, q41,
q44, q48-q52, q54, q55, q59, q61, q66, q67, q84, q94) are hash-verified
against committed golden
parquet tables under ``golden/``, computed independently by
tools/make_golden.py (brute-force all-pairs for the banded simhash join,
numpy ANN reimplementations at the pinned operating points, source-pixel
features for the PNG decode path, numpy zonal/gather over the reference's
own binary fixtures — apg18e GeoTIFF, data/grids .rds — which DuckDB
cannot read directly, a stdlib-HTMLParser re-extraction for q54, and a
generator-direct expected table for the WARC chain q55). q56's oracle
CONSTRUCTS expected canonical URLs from doc_id; q57's oracle is DuckDB's
native ASOF LEFT JOIN.

NOTE on CORRECTNESS_r{N}.json coverage: the round driver's comparison file
has covered exactly q01–q50 since r3 (a ~50-query cap in the driver
harness, observed empirically — r3 registry had 72 queries, driver file
had 50 rows, all green). The committed harness ``tools/verify_entry.py``
runs the FULL registry against the same oracles with the same
shape+column-sorted-value-hash compare and is the per-round gate for
q51+; keep it at N/N green.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from air_health_gis_tools_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q01_buffered_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
