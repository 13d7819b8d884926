"""F1: Z-stack projection — C×Z×H×W → C×H×W by max or mean.

Reference semantics: src/scip/projection/op.py:25-45 (numpy
max/mean over axis 1), applied per record. Null pixels propagate
(the reference's @check guard, src/scip/utils/util.py:202-208).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from scip_spark.operators import map_events
from scip_spark.schema import decode_series, encode_series

_OPS = {"max": np.max, "mean": np.mean}


def project(df: DataFrame, op: str = "max") -> DataFrame:
    if op not in _OPS:
        raise ValueError(f"unknown projection op {op!r}; expected one of {sorted(_OPS)}")
    reducer = _OPS[op]

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = decode_series(pdf["pixels"], pdf["pixels_shape"])
        out = [None if a is None or a.ndim != 4 else reducer(a, axis=1).astype(np.float32) for a in arrs]
        flat, shape = encode_series(out)
        pdf = pdf.copy()
        pdf["pixels"] = flat.values
        pdf["pixels_shape"] = shape.values
        return pdf

    return map_events(df, batch)
