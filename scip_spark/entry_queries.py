"""Aggregator: importing this module populates the full query REGISTRY
(core relational + text/dedup/similarity/tensor extensions)."""

import scip_spark.queries  # noqa: F401  core relational operators
import scip_spark.advanced_queries  # noqa: F401  asof/range/cube/setops/windows
import scip_spark.scalar_queries  # noqa: F401  math/array/datetime surface
import scip_spark.sql_queries  # noqa: F401  SQL-API entry point queries
import scip_spark.stats_queries  # noqa: F401  higher moments, MAD
import scip_spark.tpch_queries  # noqa: F401  outer joins, IN/NOT-IN, HAVING

# Extended registries (each module registers into queries.REGISTRY on import)
for _mod in (
    "scip_spark.functions.text_queries",
    "scip_spark.functions.dedup_queries",
    "scip_spark.functions.similarity_queries",
    "scip_spark.functions.tensor_queries",
    "scip_spark.functions.sketch_queries",
):
    try:
        __import__(_mod)
    except ImportError:
        pass
