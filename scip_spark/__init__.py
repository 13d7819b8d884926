"""scip_spark — a PySpark-native analytics & image-dataflow engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (ScalableCytometryImageProcessing/SCIP, Dask-based):
scientific-image loading, projection, masking, illumination correction,
QC filtering, normalization, segmentation and wide feature extraction —
plus the LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) required at 100 TB scale.

Design (see SURVEY.md):
- One DataFrame with nullable columns replaces the reference's
  key-appearing/disappearing record dicts (SURVEY §1.1).
- Tensors travel as flattened ``array<float>`` + ``shape array<int>``
  columns (the reference's own zarr layout, reference
  docs/source/input.rst:19-23); see :mod:`scip_spark.schema`.
- Relational shell stays in Catalyst/whole-stage-codegen; per-record
  tensor compute runs in Arrow-batched pandas UDFs
  (:mod:`scip_spark.kernels`).
"""

from scip_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
