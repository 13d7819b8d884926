"""S10-S14: sinks.

- S10 parquet: ``df.write.parquet`` (built-in; partition-file naming is
  Spark's job — the reference hand-rolled per-partition filenames only
  because dask made it write one file per partition itself).
- S11 anndata: per-partition .h5ad writer — needs h5py/anndata, which
  aren't installed; stubbed behind an import-try like the reference's
  optional extras (setup.cfg:52-60).
- S12 labeled-mask export: side-effecting foreachPartition writing .npy.
- S13 channel-boundaries CSV: driver-side collect → csv (tiny).
- S14 correction-image pickle: driver-side pickle of the small dict.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def export_parquet(df: DataFrame, output: str, mode: str = "overwrite",
                   partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(output)


def export_anndata(
    df: DataFrame,
    output: str,
    filename: str = "features",
    anndata_factory=None,
) -> int:
    """Split feat_*/meta columns into one ``.h5ad`` file per partition
    (reference src/scip/export/anndata.py:12-60), written EXECUTOR-side
    via ``mapInPandas`` — no driver collect, so the sink scales with the
    cluster exactly like ``export_labeled_masks``. Returns rows written.

    ``anndata_factory`` is a zero-arg callable returning an
    anndata-compatible module/namespace, imported INSIDE the task (the
    real import by default). Tests inject a fake factory — cloudpickle
    ships it by value — which exercises the full distributed write path
    without the optional dependency (reference treats anndata as an
    optional extra, setup.cfg:52-60)."""
    if anndata_factory is None:
        try:
            import anndata  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "anndata/h5py are not installed in this environment; the "
                "parquet sink is the supported path here, or inject "
                "anndata_factory."
            ) from e

        def anndata_factory():  # pragma: no cover - env-dependent
            import anndata

            return anndata

    os.makedirs(output, exist_ok=True)

    def write_partitions(batches):
        from pyspark import TaskContext

        ad_mod = anndata_factory()
        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in batches]
        n = 0
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            feat = pdf[[c for c in pdf.columns if c.startswith("feat_")]]
            meta = pdf[[c for c in pdf.columns if not c.startswith("feat_")]]
            ad = ad_mod.AnnData(X=feat.to_numpy(), obs=meta)
            ad.write(os.path.join(output, f"{filename}.{pid}.h5ad"))
            n = len(pdf)
        yield pd.DataFrame({"rows_written": [n]})

    counts = df.mapInPandas(write_partitions, schema="rows_written long")
    row = counts.agg({"rows_written": "sum"}).collect()[0]
    return int(row[0] or 0)


def export_labeled_masks(df: DataFrame, output: str, group_keys: list[str]) -> int:
    """Write each record's mask as .npy named by its group keys
    (reference src/scip/segmentation/__init__.py:56-67). Side-effecting
    mapInPandas; returns number of files written, aggregated from the
    tasks themselves — on a real cluster each executor writes to ITS
    local/shared filesystem, so counting the driver's local directory
    (the previous implementation) is only correct in local mode."""
    os.makedirs(output, exist_ok=True)

    def write_partitions(batches):
        n = 0
        for pdf in batches:
            for _, row in pdf.iterrows():
                if row["mask"] is None:
                    continue
                name = "_".join(str(row[k]) for k in group_keys)
                arr = np.asarray(row["mask"], dtype=bool).reshape(
                    list(row["mask_shape"])
                )
                np.save(os.path.join(output, f"{name}.npy"), arr)
                n += 1
        yield pd.DataFrame({"files_written": [n]})

    counts = df.select("mask", "mask_shape", *group_keys).mapInPandas(
        write_partitions, schema="files_written long"
    )
    row = counts.agg({"files_written": "sum"}).collect()[0]
    return int(row[0] or 0)


def export_channel_boundaries(extents_df: DataFrame, output: str) -> str:
    """Per-group min/max → channel_boundaries.csv (reference
    src/scip/main.py:49-60); collect is safe — the frame is tiny."""
    path = os.path.join(output, "channel_boundaries.csv")
    os.makedirs(output, exist_ok=True)
    extents_df.toPandas().to_csv(path, index=False)
    return path


def save_correction_images(mu: dict[str, Any], output: str) -> str:
    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, "correction_images.pickle")
    with open(path, "wb") as f:
        pickle.dump(mu, f)
    return path


def load_correction_images(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
