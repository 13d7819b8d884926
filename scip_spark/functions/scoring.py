"""Model-based document scoring — the classifier/LLM-judge quality
filter every production corpus pipeline runs (fastText-style quality
classifiers, toxicity heads, reward models).

Spark-side plumbing is real and tested; the MODEL is injectable. The
container ships no inference runtime, so the default scorer is a
deterministic closed-form reference (score derived from document
statistics) that doubles as the DuckDB oracle — swapping in a real
model is a one-argument change and reuses the identical batching,
caching, and schema path (the same seam pattern as the CellPose
operator, scip_spark/operators/segmentation.py:91-157; reference
src/scip/segmentation/cellpose.py:70-87 for the per-worker cache).

Scale design: ``mapInPandas`` streams Arrow batches through the model
worker-side — no collect, no per-row Python; the model loads ONCE per
python worker (module-global cache, workers are reused) and scores
``batch_size`` documents per call, which is what keeps a GPU/classifier
stage throughput-bound instead of model-load-bound at 100 TB.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from scip_spark.operators.gpu import cached_model


def reference_scorer_factory():
    """Deterministic stand-in model: score in [0, 1) from length and
    token-count statistics — closed-form, so the correctness gate can
    replicate it in SQL. A real classifier plugs in here."""

    def score(texts: list[str]) -> list[float]:
        out = []
        for t in texts:
            n_chars = len(t)
            n_toks = len([w for w in t.split() if w])
            out.append(((n_chars * 31 + n_toks * 7) % 1000) / 1000.0)
        return out

    return score


def score_documents(
    docs: DataFrame,
    model_factory: Callable = reference_scorer_factory,
    model_name: str = "reference-scorer",
    batch_size: int = 256,
    text_col: str = "text",
    out_col: str = "model_score",
) -> DataFrame:
    """Attach ``out_col`` = model score per document via batched
    ``mapInPandas``. ``model_factory`` builds the model (called once
    per python worker, cached under ``model_name``); the model maps a
    list of texts to a list of float scores."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = cached_model(model_name, model_factory)
        for pdf in batches:
            scores = []
            texts = pdf[text_col].fillna("").tolist()
            for start in range(0, len(texts), batch_size):
                scores.extend(model(texts[start : start + batch_size]))
            yield pdf.assign(**{out_col: scores})

    return docs.mapInPandas(run, schema)
