"""Oracle-paired relational analogues of the reference's tensor
aggregations (SURVEY §2.4) over the embeddings table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scip_spark.queries import register, tbl

DEC10 = T.DecimalType(38, 10)


@register(
    "mean_tensor_by_group",
    """
    WITH x AS (
      SELECT label, pos, emb[pos] AS v
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(pos)
    )
    SELECT label, CAST(pos AS INT) AS pos,
           list_reduce(list_sort(list(v)), (x, y) -> x + y) / COUNT(*) AS mean_val,
           COUNT(*) AS n
    FROM x GROUP BY label, pos
    """,
    doc="A1 mean-image-per-group: tensor-slot partial+final aggregation. "
    "Sum is a fold over value-sorted doubles — a deterministic summation "
    "order both engines reproduce bit-exactly (decimal casts hit "
    "HALF_UP-vs-HALF_EVEN disagreement at the scale boundary).",
)
def mean_tensor_by_group(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    exploded = emb.select("label", F.posexplode(e).alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).cast("int").alias("pos"), "v"
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list("v")), F.lit(0.0), lambda a, x: a + x
    )
    return exploded.groupBy("label", "pos").agg(
        (fold / F.count("*")).alias("mean_val"),
        F.count("*").alias("n"),
    )


@register(
    "masked_extent_by_group",
    """
    WITH x AS (
      SELECT label, emb[pos] AS v
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(pos)
    )
    SELECT label,
           COALESCE(MIN(CASE WHEN v > 0 THEN v END), MIN(v)) AS masked_min,
           COALESCE(MAX(CASE WHEN v > 0 THEN v END), MAX(v)) AS masked_max,
           COUNT(*) AS n_values
    FROM x GROUP BY label
    """,
    doc="A2 masked min/max extents with unmasked fallback "
    "(reference src/scip/normalization/quantile_normalization.py:25-64)",
)
def masked_extent_by_group(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    x = emb.select("label", F.explode(e).alias("v"))
    masked = F.when(F.col("v") > 0, F.col("v"))
    return x.groupBy("label").agg(
        F.coalesce(F.min(masked), F.min("v")).alias("masked_min"),
        F.coalesce(F.max(masked), F.max("v")).alias("masked_max"),
        F.count("*").alias("n_values"),
    )


# ---------------------------------------------------------------------------
# S6 loader-schema synthesis over a committed real-bytes zarr fixture
# ---------------------------------------------------------------------------


def _zarr_fixture_sql() -> str:
    """Literal-VALUES DuckDB oracle generated from the committed
    expected-row JSON (scip_spark/fixtures/zarr_expected.json — written
    by tools/make_zarr_fixture.py together with the stores themselves,
    so fixture bytes and oracle share one generator). The pixel
    checksum is the order-free integer grid sum(floor(x*2^20)), exact
    in numpy, Spark and DuckDB alike."""
    import json
    from pathlib import Path

    from scip_spark.queries import literal_values_sql

    p = Path(__file__).resolve().parents[1] / "fixtures" / "zarr_expected.json"
    rows = json.loads(p.read_text())["rows"]
    return literal_values_sql(
        rows,
        {"plate": None, "well": None, "zarr_idx": "INTEGER",
         "object_number": "INTEGER", "c": "INTEGER", "h": "INTEGER",
         "w": "INTEGER", "px_sum_fp": "BIGINT"},
    )


@register(
    "zarr_schema_synthesis",
    _zarr_fixture_sql(),
    doc="S6 zarr named-group loader-schema synthesis (VERDICT r13 #6), "
    "driver-verifiable over REAL committed chunk bytes: plate/well "
    "metadata columns synthesized from the path regex exactly as the "
    "reference derives loader schema from named groups (reference "
    "src/scip/loading/zarr.py:73-86), shapes from .zattrs, pixels "
    "fetched per record from real zarr v2 chunk bytes under BOTH "
    "ragged layouts (engine group store and the reference's "
    "single-array + attrs['shape'] store) and, since r15, under "
    "zarr's DEFAULT compressor family — committed blosc-lz4 and "
    "numcodecs-lz4 compressed stores decode through the pure-Python "
    "spec codecs (sources/bloscio.py, lz4block.py) — checksummed on "
    "the exact integer grid.",
)
def zarr_schema_synthesis(spark, sf_dir):
    import glob as _glob
    from pathlib import Path

    from scip_spark.sources.filescan import zarr_attach_pixels, zarr_meta
    from scip_spark.sources.zarrio import fetch_member, group_member_shapes

    root = Path(__file__).resolve().parents[1] / "fixtures" / "zarr"
    stores = sorted(_glob.glob(str(root / "plate_*" / "*.zarr")))
    regex = r"^.*/plate_(?P<plate>\w+)/(?P<well>\w+)\.zarr$"
    df = None
    for s in stores:  # 4 stores: driver-side listing, like the
        # reference's meta_from_directory delayed per store
        m = zarr_meta(spark, group_member_shapes(s), s, regex=regex)
        df = m if df is None else df.unionByName(m)
    px = zarr_attach_pixels(df, fetch_member)
    return px.select(
        "plate",
        "well",
        "zarr_idx",
        "object_number",
        F.element_at("pixels_shape", 1).alias("c"),
        F.element_at("pixels_shape", 2).alias("h"),
        F.element_at("pixels_shape", 3).alias("w"),
        F.expr(
            "aggregate(pixels, 0L, (acc, x) -> acc + bigint(floor(double(x) * 1048576D)))"
        ).alias("px_sum_fp"),
    )


def _tiff_fixture_sql() -> str:
    """Literal-VALUES oracle from the committed expected rows (written
    by tools/make_tiff_fixture.py with the fixture bytes)."""
    import json
    from pathlib import Path

    from scip_spark.queries import literal_values_sql

    p = Path(__file__).resolve().parents[1] / "fixtures" / "tiff_expected.json"
    rows = json.loads(p.read_text())["rows"]
    return literal_values_sql(
        rows,
        {"rec": None, "c": "INTEGER", "h": "INTEGER", "w": "INTEGER",
         "px_sum_fp": "BIGINT"},
    )


@register(
    "tiff_codec_checksum",
    _tiff_fixture_sql(),
    doc="S3+S4 end-to-end from REAL committed TIFF bytes, driver-"
    "verifiable: file-per-channel listing -> regex pivot (reference "
    "src/scip/loading/tiff.py:126-158) -> per-channel decode through "
    "the pure-Python baseline codec -> CxHxW stack, checksummed on the "
    "exact integer grid. The ten fixture files each use a different "
    "codec/layout (deflate/packbits/lzw, predictor 2, multi-strip, "
    "tiled, both byte orders, u8/u16/f32, and — r15 — baseline-JPEG "
    "strips, whose lossy-but-deterministic decode pins exact values "
    "via the decode-back expected rows), so a regression in ANY codec "
    "path is a hash mismatch, not a test-only failure.",
)
def tiff_codec_checksum(spark, sf_dir):
    from pathlib import Path

    from scip_spark.sources.filescan import (
        attach_pixels,
        default_tiff_reader,
        tiff_meta,
    )

    root = Path(__file__).resolve().parents[1] / "fixtures" / "tiff"
    regex = r"^.*/(?P<rec>[a-z])_(?P<channel>[0-9])\.tiff$"
    meta = tiff_meta(spark, str(root), regex, channels=["0", "1"])
    px = attach_pixels(meta, ["0", "1"], default_tiff_reader())
    return px.select("rec", *_px_checksum_cols())


def _qc_fixture_sql() -> str:
    """Literal-VALUES oracle from rows computed in PURE NUMPY over the
    deterministic synthetic corpus (tools/make_qc_expected.py) — an
    independent evaluation of the same QC predicates the Spark query
    runs through compute_filters' mapInPandas."""
    import json
    from pathlib import Path

    from scip_spark.queries import literal_values_sql

    p = Path(__file__).resolve().parents[1] / "fixtures" / "qc_expected.json"
    rows = json.loads(p.read_text())["rows"]
    return literal_values_sql(
        rows,
        {"method": None, "group": None, "n_kept": "BIGINT",
         "flags_sum": "BIGINT"},
    )


@register(
    "qc_filter_checksum",
    _qc_fixture_sql(),
    doc="P3-P6 QC filters driver-verifiable end to end (reference "
    "src/scip/masking/__init__.py:75-95 + filters/*.py): std, "
    "value_range and the scipy-free normaltest predicates over a fixed "
    "200-image deterministic corpus, per-(method, group) kept-record "
    "and per-channel pass counts hash-matched against an INDEPENDENT "
    "pure-numpy evaluation (thresholds split the corpus ~50/50, so "
    "predicate drift in either direction flips counts). Exercises the "
    "soft-delete contract too: n_kept counts records whose pixels "
    "survive the main-channel nulling.",
)
def qc_filter_checksum(spark, sf_dir):
    from scip_spark.operators.masking import compute_filters
    from scip_spark.plans.imaging_bench import synthetic_images
    from scip_spark.schema import ensure_event_columns

    src = ensure_event_columns(synthetic_images(spark, 200)).localCheckpoint(
        eager=False
    )
    outs = []
    for method, thr in [("std", 24.0), ("value_range", 140.0), ("normaltest", 0.05)]:
        f = compute_filters(src, method, threshold=thr)
        outs.append(
            f.select(
                F.lit(method).alias("method"),
                "group",
                F.col("pixels").isNotNull().cast("long").alias("kept"),
                F.expr(
                    "aggregate(transform(mask_filter, b -> if(b, 1L, 0L)),"
                    " 0L, (acc, x) -> acc + x)"
                ).alias("fl"),
            )
        )
    un = outs[0]
    for o in outs[1:]:
        un = un.unionByName(o)
    return un.groupBy("method", "group").agg(
        F.sum("kept").alias("n_kept"), F.sum("fl").alias("flags_sum")
    )


@register(
    "datasource_image_checksum",
    _tiff_fixture_sql(),
    doc="S2b Python DataSource end-to-end from REAL bytes, driver-"
    "verifiable: spark.read.format('scip_images') over the committed "
    "TIFF fixture with reader=scip_spark.sources.tiffio:read_tiff "
    "(discovery + partition planning + per-record decode all inside "
    "the DataSource API), checksummed on the exact integer grid — the "
    "same expected rows as tiff_codec_checksum, so the two paths "
    "(filescan pivot+attach vs DataSource) are proven value-identical.",
)
def datasource_image_checksum(spark, sf_dir):
    from pathlib import Path

    from scip_spark.sources.datasource import register_image_source

    if not register_image_source(spark):
        raise RuntimeError("Python DataSource API unavailable (Spark < 4)")
    root = Path(__file__).resolve().parents[1] / "fixtures" / "tiff"
    df = (
        spark.read.format("scip_images")
        .option("path", str(root))
        .option("reader", "scip_spark.sources.tiffio:read_tiff")
        .option("recordsPerPartition", "2")
        .load()
    )
    return df.select("rec", *_px_checksum_cols())


@register(
    "parquet_sink_roundtrip",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
           CAST(SUM(CAST(doc_id AS BIGINT) * 31 % 1048576) AS BIGINT)
             AS id_mix
    FROM documents
    GROUP BY source
    """,
    doc="S10 parquet sink, driver-verifiable as a ROUND TRIP (reference "
    "src/scip/main.py export stage): the documents table is written "
    "through export_parquet (partitioned by lang - multi-directory "
    "layout), read back from the sink files, and aggregated; the oracle "
    "computes the same aggregate from the ORIGINAL table, so any "
    "write/rescan corruption (lost rows, partition-column round-trip "
    "drift, type mangling) is a hash mismatch. The sink result is "
    "checkpointed before the temp dir is removed.",
)
def parquet_sink_roundtrip(spark, sf_dir):
    import shutil
    import tempfile

    from scip_spark.sources.export import export_parquet

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="scip_sink_") + "/docs"
    try:
        export_parquet(docs, out, partition_by=["lang"])
        back = spark.read.parquet(out)
        agg = back.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum(
                F.col("doc_id").cast("long") * F.lit(31) % F.lit(1048576)
            ).cast("long").alias("id_mix"),
        )
        # pin the (tiny) result before the sink dir disappears
        return agg.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


@register(
    "boundaries_csv_roundtrip",
    f"""
    WITH x AS (
      SELECT label, u.i AS channel, emb[u.i] AS v
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(i)
      WHERE u.i <= 4
    )
    SELECT label, CAST(channel AS INT) AS channel,
           CAST(floor(MIN(v) * 1099511627776) AS BIGINT) AS gmin_fp,
           CAST(floor(MAX(v) * 1099511627776) AS BIGINT) AS gmax_fp
    FROM x GROUP BY label, channel
    """,
    doc="S13 boundaries-CSV sink, driver-verifiable as a ROUND TRIP "
    "(reference src/scip/main.py:49-60 writes channel_boundaries.csv): "
    "per-(label, channel) extents on the exact 2^40 integer grid are "
    "written through export_channel_boundaries and read BACK from the "
    "CSV text; the oracle computes the same extents from the original "
    "table, so any to_csv/read-back drift (row loss, header mangling, "
    "numeric text truncation) is a hash mismatch. Extents ride as "
    "BIGINTs so the text round trip is exact by construction.",
)
def boundaries_csv_roundtrip(spark, sf_dir):
    import shutil
    import tempfile

    from scip_spark.sources.export import export_channel_boundaries

    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    x = emb.select(
        "label", F.posexplode(F.slice(e, 1, 4)).alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).cast("int").alias("channel"), "v")
    fp = F.lit(1099511627776)  # 2^40: floor + power-of-two scaling exact
    ext = x.groupBy("label", "channel").agg(
        F.floor(F.min("v") * fp).cast("long").alias("gmin_fp"),
        F.floor(F.max("v") * fp).cast("long").alias("gmax_fp"),
    )
    out = tempfile.mkdtemp(prefix="scip_bounds_")
    try:
        csv_path = export_channel_boundaries(ext, out)
        # explicit schema (ADVICE r14): inferSchema would coerce a
        # numeric-looking label like '007' to 7 and report a value
        # drift that is read-back inference, not sink corruption. The
        # schema binds POSITIONALLY (header skipped under default
        # enforceSchema), so assert the header first — a reordered
        # writer column must fail loudly, not misroute values
        with open(csv_path) as fh:
            header = fh.readline().strip()
        if header != "label,channel,gmin_fp,gmax_fp":
            raise ValueError(f"boundaries CSV header drifted: {header!r}")
        back = spark.read.csv(
            csv_path,
            header=True,
            schema="label STRING, channel INT, gmin_fp LONG, gmax_fp LONG",
        )
        return back.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _px_checksum_cols():
    return [
        F.element_at("pixels_shape", 1).alias("c"),
        F.element_at("pixels_shape", 2).alias("h"),
        F.element_at("pixels_shape", 3).alias("w"),
        F.expr(
            "aggregate(pixels, 0L, (acc, x) -> acc + bigint(floor(double(x) * 1048576D)))"
        ).alias("px_sum_fp"),
    ]


@register(
    "datasource_image_stream_checksum",
    _tiff_fixture_sql(),
    doc="S2b STREAMING twin (15th driver-hash-checked streaming entry): "
    "the scip_images micro-batch reader streams the committed TIFF "
    "fixture (offset = complete-record count), each micro-batch decodes "
    "real bytes through the baseline codec and lands its integer-grid "
    "checksums in a foreachBatch parquet sink; the drained sink "
    "hash-matches the same literal oracle as the batch path, so "
    "streaming == batch on the tensor source, bit for bit.",
)
def datasource_image_stream_checksum(spark, sf_dir):
    import shutil
    import tempfile
    from pathlib import Path

    from scip_spark.sources.datasource import register_image_source

    if not register_image_source(spark):
        raise RuntimeError("Python DataSource API unavailable (Spark < 4)")
    root = Path(__file__).resolve().parents[1] / "fixtures" / "tiff"
    sink = tempfile.mkdtemp(prefix="scip_imgstream_")
    out_dir, ckpt = f"{sink}/out", f"{sink}/ckpt"

    def fold(batch_df, epoch_id):
        batch_df.select("rec", *_px_checksum_cols()).write.mode("append").parquet(
            out_dir
        )

    try:
        q = (
            spark.readStream.format("scip_images")
            .option("path", str(root))
            .option("reader", "scip_spark.sources.tiffio:read_tiff")
            .option("recordsPerPartition", "2")
            .load()
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("image stream did not finish in 600s")
        return spark.read.parquet(out_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sink, ignore_errors=True)


@register(
    "correction_pickle_roundtrip",
    f"""
    WITH x AS (
      SELECT label, u.i AS dim,
             CAST(floor(emb[u.i] * 1099511627776) AS BIGINT) AS fx
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(i)
      WHERE u.i <= 8
    )
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(SUM(fx) AS BIGINT) AS sum_fp,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM x GROUP BY label, dim
    """,
    doc="S14 correction-image pickle sink, driver-verifiable as a ROUND "
    "TRIP (reference src/scip/main.py dumps the illumination mu dict; "
    "utils/util.py reloads it): per-label fixed-point tensor sums are "
    "aggregated relationally, shipped through save_correction_images / "
    "load_correction_images as numpy arrays, and re-emitted from the "
    "LOADED dict; the oracle recomputes the sums from the original "
    "table, so pickle/ndarray round-trip corruption hash-mismatches.",
)
def correction_pickle_roundtrip(spark, sf_dir):
    import shutil
    import tempfile

    import numpy as np

    from scip_spark.sources.export import (
        load_correction_images,
        save_correction_images,
    )

    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    fp = F.lit(1099511627776)  # 2^40
    agg = (
        emb.select("label", F.posexplode(F.slice(e, 1, 8)).alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("dim"), "v")
        .groupBy("label", "dim")
        .agg(
            F.sum(F.floor(F.col("v") * fp).cast("long")).alias("sum_fp"),
            F.count("*").cast("long").alias("n"),
        )
    )
    rows = agg.collect()  # bounded: labels x 8 dims
    mu: dict[str, np.ndarray] = {}
    cnt: dict[str, np.ndarray] = {}
    for lbl in sorted({r["label"] for r in rows}):
        sub = sorted((r for r in rows if r["label"] == lbl), key=lambda r: r["dim"])
        mu[lbl] = np.array([r["sum_fp"] for r in sub], dtype=np.int64)
        cnt[lbl] = np.array([r["n"] for r in sub], dtype=np.int64)
    out = tempfile.mkdtemp(prefix="scip_corr_")
    try:
        p = save_correction_images({"mu": mu, "n": cnt}, out)
        back = load_correction_images(p)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    data = [
        (lbl, d + 1, int(back["mu"][lbl][d]), int(back["n"][lbl][d]))
        for lbl in back["mu"]
        for d in range(len(back["mu"][lbl]))
    ]
    return spark.createDataFrame(
        data, "label string, dim int, sum_fp long, n long"
    )


# ---------------------------------------------------------------------------
# S11/S12 sink roundtrips (VERDICT r14 #5): the last two side-effect
# sinks become driver-verifiable. Neither payload format's library
# exists in this container (anndata/h5py), so the anndata roundtrip
# injects the same kind of fake module the S11 tests use — but the
# DISTRIBUTED machinery under test (mapInPandas executor-side writes,
# feat_/meta column split, per-partition file naming, the binaryFile
# distributed read-back) is the real sink path end to end.
# ---------------------------------------------------------------------------

_FP40 = 1099511627776  # 2^40 fixed-point grid (floor + pow2 exact cross-engine)


class _NpzAnnData:
    """Minimal AnnData stand-in: holds (X, obs) and writes both to the
    target path as a numpy .npz archive (written through an open file
    handle so numpy cannot append its own extension — the sink names
    files ``<name>.<pid>.h5ad`` and the read-back globs on that)."""

    def __init__(self, X, obs):
        self.X = X
        self.obs = obs

    def write(self, path):
        import numpy as np

        with open(path, "wb") as f:
            np.savez(
                f,
                X=np.asarray(self.X, dtype=np.float64),
                **{
                    f"obs_{c}": self.obs[c].to_numpy()
                    for c in self.obs.columns
                },
            )


class _NpzAnnDataModule:
    AnnData = _NpzAnnData


def _npz_anndata_factory():
    return _NpzAnnDataModule


@register(
    "anndata_sink_roundtrip",
    f"""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(emb[1] * {_FP40}) AS BIGINT)) AS BIGINT) AS d1_sum,
           CAST(SUM(CAST(floor(emb[2] * {_FP40}) AS BIGINT)) AS BIGINT) AS d2_sum,
           CAST(SUM(CAST(floor(emb[3] * {_FP40}) AS BIGINT)) AS BIGINT) AS d3_sum,
           CAST(SUM(CAST(floor(emb[4] * {_FP40}) AS BIGINT)) AS BIGINT) AS d4_sum
    FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings)
    GROUP BY label
    """,
    doc="S11 anndata sink, driver-verifiable as a ROUND TRIP (reference "
    "src/scip/export/anndata.py:12-60 splits feat_/meta columns into "
    "one .h5ad per partition): four feature columns + a meta label go "
    "through export_anndata's executor-side mapInPandas write (the "
    "injected module serializes (X, obs) as .npz since anndata/h5py "
    "are absent here — the reference ships it as an optional extra), "
    "then the files are read BACK distributed via Spark's binaryFile "
    "source (no driver listing, one task per file) and rolled up per "
    "label on the 2^40 integer grid. The oracle computes the same "
    "rollup from the original table, so row loss, column misrouting "
    "(a feat_ column landing in obs), X column-order drift or float "
    "corruption in the sink all hash-mismatch. Scale shape: writes "
    "and reads are both one-task-per-file mapInPandas/binaryFile — "
    "the corpus never moves through the driver.",
)
def anndata_sink_roundtrip(spark, sf_dir):
    import io
    import shutil
    import tempfile
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from scip_spark.sources.export import export_anndata

    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    df = emb.select(
        F.col("label").cast("long").alias("label"),
        *[F.element_at(e, i + 1).alias(f"feat_d{i + 1}") for i in range(4)],
    )
    out = tempfile.mkdtemp(prefix="scip_anndata_")
    try:
        export_anndata(df, out, anndata_factory=_npz_anndata_factory)
        files = spark.read.format("binaryFile").load(f"{out}/*.h5ad")

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for _, r in pdf.iterrows():
                    z = np.load(io.BytesIO(bytes(r["content"])))
                    X = z["X"]
                    lab = z["obs_label"].astype(np.int64)
                    fp = np.floor(X * float(_FP40)).astype(np.int64)
                    yield pd.DataFrame(
                        {
                            "label": lab,
                            **{f"d{i + 1}": fp[:, i] for i in range(4)},
                        }
                    )

        rows = files.select("content").mapInPandas(
            decode, schema="label long, d1 long, d2 long, d3 long, d4 long"
        )
        agg = rows.groupBy("label").agg(
            F.count("*").cast("long").alias("n_rows"),
            *[
                F.sum(f"d{i + 1}").cast("long").alias(f"d{i + 1}_sum")
                for i in range(4)
            ],
        )
        return agg.localCheckpoint(eager=True)  # pin before the dir goes
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "labeled_mask_sink_roundtrip",
    """
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum,
           CAST(SUM(len(list_filter(embedding::DOUBLE[], v -> v > 0.5)))
                AS BIGINT) AS npix_sum
    FROM embeddings
    GROUP BY label
    """,
    doc="S12 labeled-mask sink, driver-verifiable as a ROUND TRIP "
    "(reference src/scip/segmentation/__init__.py:56-67 writes one "
    ".npy mask per object named by its group keys): a deterministic "
    "boolean mask per embedding (dim value > 0.5, shaped 1x8x8) goes "
    "through export_labeled_masks' executor-side per-record np.save, "
    "then every file is read BACK distributed via binaryFile (one "
    "task per file, keys re-parsed from the sink's own file names) "
    "and rolled up per label: file count, id mix, true-pixel sum. "
    "Row loss, name collisions, dtype/shape corruption or bit flips "
    "in the stored masks all hash-mismatch against the oracle "
    "computed from the original table.",
)
def labeled_mask_sink_roundtrip(spark, sf_dir):
    import io
    import os as _os
    import shutil
    import tempfile
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from scip_spark.sources.export import export_labeled_masks

    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    df = emb.select(
        F.col("label").cast("long").alias("label"),
        "vec_id",
        F.transform(e, lambda x: x > 0.5).alias("mask"),
        F.array(F.lit(1), F.lit(8), F.lit(8)).alias("mask_shape"),
    )
    out = tempfile.mkdtemp(prefix="scip_masks_")
    try:
        export_labeled_masks(df, out, group_keys=["label", "vec_id"])
        files = spark.read.format("binaryFile").load(f"{out}/*.npy")

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                recs = []
                for _, r in pdf.iterrows():
                    stem = _os.path.basename(r["path"])[: -len(".npy")]
                    label_s, vec_s = stem.rsplit("_", 1)
                    arr = np.load(io.BytesIO(bytes(r["content"])))
                    assert arr.shape == (1, 8, 8) and arr.dtype == bool
                    recs.append(
                        (int(label_s), int(vec_s), int(arr.sum()))
                    )
                if recs:
                    yield pd.DataFrame(
                        recs, columns=["label", "vec_id", "npix"]
                    )

        rows = files.select("path", "content").mapInPandas(
            decode, schema="label long, vec_id long, npix long"
        )
        agg = rows.groupBy("label").agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("vec_id").cast("long").alias("id_sum"),
            F.sum("npix").cast("long").alias("npix_sum"),
        )
        return agg.localCheckpoint(eager=True)  # pin before the dir goes
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _czi_fixture_sql() -> str:
    """Literal-VALUES oracle from the committed expected rows (written
    by tools/make_czi_fixture.py with the fixture bytes)."""
    import json
    from pathlib import Path

    from scip_spark.queries import literal_values_sql

    p = Path(__file__).resolve().parents[1] / "fixtures" / "czi_expected.json"
    rows = json.loads(p.read_text())["rows"]
    return literal_values_sql(
        rows,
        {"scene": None, "tile": "INTEGER", "well": None, "pos": None,
         "c": "INTEGER", "h": "INTEGER", "w": "INTEGER",
         "px_sum_fp": "BIGINT"},
    )


@register(
    "czi_schema_synthesis",
    _czi_fixture_sql(),
    doc="S8+S9 end-to-end from REAL committed ZISRAW (CZI) container "
    "bytes (r15 — the last source format that only ever ran against "
    "injected fakes): scene inventory parsed from the binary subblock "
    "directory + metadata XML (sources/zisraw.py), scene-name regex "
    "metadata synthesis exactly as the reference derives it from "
    "named groups (src/scip/loading/czi.py:85-87), one record per "
    "(scene, tile) via czi_meta's explode, pixels fetched per record "
    "from uncompressed Gray8/Gray16/Gray32Float subblocks and "
    "checksummed on the exact integer grid. Compressed subblocks "
    "(JPEG-XR/zstd) still fail fast to the injected aicsimageio "
    "reader.",
)
def czi_schema_synthesis(spark, sf_dir):
    from pathlib import Path

    from scip_spark.sources.filescan import (
        czi_attach_pixels,
        czi_meta,
        czi_scene_meta,
    )
    from scip_spark.sources.zisraw import fetch_tile, scene_inventory

    path = str(
        Path(__file__).resolve().parents[1] / "fixtures" / "czi"
        / "acquisition.czi"
    )
    scenes, tiles = scene_inventory(path)  # driver-side, like the ref
    df = czi_meta(spark, path, scenes, tiles)
    df = czi_scene_meta(df, r"well_(?P<well>\w+)_pos_(?P<pos>\d+)")
    px = czi_attach_pixels(df, reader=fetch_tile)
    return px.select(
        "scene",
        "tile",
        "well",
        "pos",
        F.element_at("pixels_shape", 1).alias("c"),
        F.element_at("pixels_shape", 2).alias("h"),
        F.element_at("pixels_shape", 3).alias("w"),
        F.expr(
            "aggregate(pixels, 0L, (acc, x) -> acc + bigint(floor(double(x) * 1048576D)))"
        ).alias("px_sum_fp"),
    )
