"""Stage operators: each is ``DataFrame -> DataFrame`` over the event
schema (scip_spark.schema.EVENT_SCHEMA semantics — nullable columns in
place of the reference's appearing/disappearing dict keys).

Heavy per-record tensor work runs in ``mapInPandas`` (Arrow batches);
relational glue (grouping, broadcasting, filtering) stays in Catalyst.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def map_events(
    df: DataFrame,
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """mapInPandas wrapper: apply ``batch_fn`` to each Arrow batch.

    ``schema`` defaults to the input schema (shape-preserving stage).
    """
    out_schema = schema if schema is not None else df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = batch_fn(pdf)
            if len(out):
                yield out

    return df.mapInPandas(gen, schema=out_schema)
