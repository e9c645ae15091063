"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship near-duplicate pipeline (signatures -> LSH
candidates -> verification -> connected components -> best pick) on the
sf0.001 ``documents`` table.  ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 with DuckDB-verifiable semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from image_deduplication_3m_images_spark.oracles import oracle_sql_map
from image_deduplication_3m_images_spark.plans.queries import ALL_QUERIES, q_best_pick


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_best_pick(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/types).

    Every queries() entry has an oracle, including ``embedding_topk_lsh``
    (the sign-LSH bucket id is a dot product against literal hyperplanes,
    so the oracle evaluates the identical expression).
    """
    return oracle_sql_map()
