"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship buffered-zonal-stats pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` pairs each with an exact DuckDB oracle (all floating outputs
are engineered to be bit-identical across engines — see
air_health_gis_tools_spark/geo_synth.py). Queries without an oracle entry
(q22-q24: lang-id heuristic, simhash NN, LSH-ANN) are non-SQL-expressible
kernels; they are pytest-verified instead.
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
