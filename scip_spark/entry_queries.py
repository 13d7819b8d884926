"""Aggregator: importing this module populates the full query REGISTRY
(core relational + text/dedup/similarity/tensor extensions)."""

import scip_spark.queries  # noqa: F401  core relational operators
import scip_spark.advanced_queries  # noqa: F401  asof/range/cube/setops/windows
import scip_spark.scalar_queries  # noqa: F401  math/array/datetime surface
import scip_spark.sql_queries  # noqa: F401  SQL-API entry point queries
import scip_spark.governance_queries  # noqa: F401  SCD2, pseudonymization
import scip_spark.stats_queries  # noqa: F401  higher moments, MAD
import scip_spark.tpch_queries  # noqa: F401  outer joins, IN/NOT-IN, HAVING
import scip_spark.ops_queries  # noqa: F401  FK audit, skew profile, winsorize

# Extended registries (each module registers into queries.REGISTRY on
# import). Imports are NOT guarded: a broken module must fail loudly,
# not silently shrink the query surface the driver grades.
import scip_spark.functions.corpus_queries  # noqa: F401
import scip_spark.functions.dedup_queries  # noqa: F401
import scip_spark.functions.graph_queries  # noqa: F401
import scip_spark.functions.quality_queries  # noqa: F401
import scip_spark.functions.quantile_queries  # noqa: F401
import scip_spark.functions.similarity_queries  # noqa: F401
import scip_spark.functions.sketch_queries  # noqa: F401
import scip_spark.functions.tensor_queries  # noqa: F401
import scip_spark.functions.text_queries  # noqa: F401
import scip_spark.plans.imaging_bench  # noqa: F401  e2e tensor pipeline

# registry floor: catches an accidentally-deleted registration at
# import time, where the driver (and tests) will see it immediately
from scip_spark.queries import REGISTRY as _R

assert len(_R) >= 137, f"query registry shrank: {len(_R)} entries"
