"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship buffered-zonal-stats pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (53
queries in r3, incl. icosahedral H3 q49/q52, the two-CRS srg-dev workflow
q50, the geocode→CRS→pixel chain q51 and the curation-pipeline q53);
``oracle_sql()`` pairs EVERY query with a DuckDB oracle (all floating
outputs are engineered to be bit-identical across engines — see
air_health_gis_tools_spark/geo_synth.py). Since r3 there are no rows-only
queries left: the formerly `no_oracle` rows (q22-q24, q30, q31, q41,
q44, q48 + the new q49-q52) are hash-verified against committed golden
parquet tables under ``golden/``, computed independently by
tools/make_golden.py (brute-force all-pairs for the banded simhash join,
numpy ANN reimplementations at the pinned operating points, source-pixel
features for the PNG decode path, and numpy zonal/gather over the
reference's own binary fixtures — apg18e GeoTIFF, data/grids .rds — which
DuckDB cannot read directly).
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
