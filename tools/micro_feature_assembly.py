#!/usr/bin/env python
"""Deterministic CPU micro A/B for the r15 feature-frame assembly change.

make_features_batch's output used to be built as a list of ~705-key
per-row dicts fed to ``pd.DataFrame(rows, columns=...)``; r15 replaced
that with one (n x n_feat) float64 matrix + 5 meta columns. The kernels
(_record_features / _stats11_many) are identical either way, so this
harness computes them ONCE and then times ONLY the two assembly paths
over the same resolved tokens — single-core ``time.process_time``,
min-of-N, no Spark, no box-noise dependence (the protocol that settled
the r8/r10 kernel A/Bs). It also asserts the two frames are equivalent
under Arrow semantics (None and NaN in a float64 column both serialize
to NULL).

Usage: python tools/micro_feature_assembly.py [rows=512] [reps=7]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from scip_spark.operators.features import (  # noqa: E402
    DEFAULT_FAMILIES,
    _record_features,
    _resolve_features,
    _stats11_many,
    feature_columns,
    feature_schema,
)

SIDE = 32
NCH = 3


def make_inputs(n: int):
    rng = np.random.default_rng(42)
    recs = []
    for t in range(n):
        a = (rng.random((NCH, SIDE, SIDE)) * 120).astype(np.float32)
        m = np.zeros((NCH, SIDE, SIDE), dtype=bool)
        m[:, 4:28, 6:30] = True
        recs.append(
            {
                "path": f"/synthetic/bench_{t}.tiff",
                "group": f"g{t % 4}",
                "id": 0,
                "object_number": t,
                "pixels": a,
                "mask": m,
                "combined_mask": m.any(axis=0),
                "background": rng.random(NCH),
                "combined_background": rng.random(NCH),
                "bbox": [4, 6, 28, 30],
                "regions": [1] * NCH,
            }
        )
    return recs


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    recs = make_inputs(n)
    families = DEFAULT_FAMILIES
    feat_cols = feature_columns(NCH, families)
    schema = feature_schema(NCH, families)
    names = [f.name for f in schema.fields]

    # kernel work, shared by both paths (identical in both revisions)
    jobs: list[np.ndarray] = []
    tokens_all = [
        _record_features(
            r["pixels"],
            r["mask"],
            r["combined_mask"],
            r["background"],
            r["combined_background"],
            r["bbox"],
            families,
            NCH,
            jobs=jobs,
        )
        for r in recs
    ]
    stats = _stats11_many(jobs)
    resolved = [_resolve_features(t, stats) for t in tokens_all]

    def assemble_old() -> pd.DataFrame:
        rows = []
        for r, vals in zip(recs, resolved):
            meta = {
                "path": r["path"],
                "group": r["group"],
                "id": r["id"],
                "object_number": r["object_number"],
                "regions": r["regions"],
            }
            rows.append({**meta, **dict(zip(feat_cols, vals))})
        return pd.DataFrame(rows, columns=names)

    def assemble_new() -> pd.DataFrame:
        mat = np.full((len(recs), len(feat_cols)), np.nan, dtype=np.float64)
        for i, vals in enumerate(resolved):
            mat[i] = np.asarray(vals, dtype=np.float64)
        meta_df = pd.DataFrame(
            {
                "path": [r["path"] for r in recs],
                "group": [r["group"] for r in recs],
                "id": [r["id"] for r in recs],
                "object_number": [r["object_number"] for r in recs],
                "regions": [r["regions"] for r in recs],
            }
        )
        feat_df = pd.DataFrame(mat, columns=feat_cols, copy=False)
        return pd.concat([meta_df, feat_df], axis=1)

    def best(fn):
        b = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.process_time()
            out = fn()
            b = min(b, time.process_time() - t0)
        return b, out

    t_old, df_old = best(assemble_old)
    t_new, df_new = best(assemble_new)

    # equivalence under Arrow semantics: same columns, meta identical,
    # feature cells equal with None == NaN == NULL
    assert list(df_old.columns) == list(df_new.columns) == names
    for c in ("path", "group", "id", "object_number"):
        assert df_old[c].tolist() == df_new[c].tolist(), c
    old_block = df_old[feat_cols].astype(np.float64).to_numpy()
    new_block = df_new[feat_cols].to_numpy()
    np.testing.assert_array_equal(old_block, new_block)

    print(
        f"rows={n} feat_cols={len(feat_cols)} reps={reps}\n"
        f"old rows-of-dicts assembly: {t_old * 1e3:8.1f} ms/batch\n"
        f"new columnar assembly:      {t_new * 1e3:8.1f} ms/batch\n"
        f"speedup: {t_old / t_new:.1f}x  (values identical)"
    )


if __name__ == "__main__":
    main()
