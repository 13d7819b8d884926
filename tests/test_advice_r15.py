"""Round-14 ADVICE regressions: zarr metadata-cache staleness on
write-after-read, the Fortran-order guard on the single-array row
reader, and fixture-oracle quoting (apostrophes / NULL cells)."""

from __future__ import annotations

import numpy as np
import pytest

from scip_spark.queries import literal_values_sql
from scip_spark.sources import zarrio


def test_zarr_write_after_read_serves_fresh_metadata(tmp_path):
    """Rewriting a store in place must invalidate the per-process
    metadata cache — the stale path silently returned the OLD shape."""
    store = str(tmp_path / "store.zarr")
    zarrio.write_array(store, np.arange(6, dtype=np.int32).reshape(2, 3))
    assert zarrio.read_array(store).shape == (2, 3)  # caches .zarray
    zarrio.write_array(store, np.arange(20, dtype=np.int32).reshape(4, 5))
    back = zarrio.read_array(store)
    assert back.shape == (4, 5)
    assert back[3, 4] == 19


def test_zarr_ragged_rewrite_serves_fresh_attrs(tmp_path):
    store = str(tmp_path / "ragged.zarr")
    zarrio.write_ragged_array(store, [np.zeros((2, 2)), np.zeros((3, 1))])
    assert zarrio.group_member_shapes(store) == [[2, 2], [3, 1]]
    zarrio.write_ragged_array(store, [np.zeros((5,))])
    assert zarrio.group_member_shapes(store) == [[5]]


def test_zarr_row_reader_rejects_fortran_order(tmp_path):
    """_read_array_row must fail fast on order='F' like read_array does
    (silent wrong-pixel decode otherwise)."""
    import json
    import os

    store = str(tmp_path / "f.zarr")
    zarrio.write_array(store, np.arange(12, dtype=np.int32).reshape(3, 4))
    meta_path = os.path.join(store, ".zarray")
    meta = json.load(open(meta_path))
    meta["order"] = "F"
    json.dump(meta, open(meta_path, "w"))
    zarrio._store_json.cache_clear()
    with pytest.raises(ValueError, match="C-order"):
        zarrio._read_array_row(store, 0)


def test_literal_values_sql_escapes_apostrophes():
    import duckdb

    sql = literal_values_sql(
        [{"name": "o'brien", "n": 3}], {"name": None, "n": "BIGINT"}
    )
    rows = duckdb.connect().execute(sql).fetchall()
    assert rows == [("o'brien", 3)]


def test_literal_values_sql_rejects_null_cells():
    with pytest.raises(ValueError, match="NULL"):
        literal_values_sql([{"name": None}], {"name": None})
