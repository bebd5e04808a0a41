"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship buffered-zonal-stats pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` pairs each with an exact DuckDB oracle (all floating outputs
are engineered to be bit-identical across engines — see
air_health_gis_tools_spark/geo_synth.py). Queries without an oracle entry
are non-SQL-expressible and pytest-verified instead: q22-q24 (lang-id
heuristic kernel, FNV simhash, LSH-ANN), q30/q41 (S2 cells, IVF), q31
(multimodal plumbing), and q44/q48, which run on the REFERENCE'S OWN
binary fixtures (apg18e GeoTIFF, data/grids .rds) that DuckDB cannot read
— their bit-level parity lives in tests/test_geotiff.py and
tests/test_rds.py.
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
