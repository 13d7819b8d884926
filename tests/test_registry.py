import numpy as np
import pytest

from scip_spark.functions.registry import register_op, registered, resolve
from scip_spark.operators.gpu import cached_model


def test_builtin_ops_registered():
    kinds = dict.fromkeys(k for k, _ in registered())
    assert {"mask", "filter", "projection", "map", "expand", "source"} <= set(kinds)
    assert ("mask", "otsu") in registered("mask")


def test_resolve_and_error():
    fn = resolve("mask", "circle")
    m = fn(np.arange(100, dtype=np.float32).reshape(10, 10))
    assert m.dtype == bool and m[5, 5]
    with pytest.raises(KeyError, match="available"):
        resolve("mask", "nope")
    with pytest.raises(ValueError):
        register_op("bogus_kind", "x")


def test_user_extension_dispatch():
    @register_op("mask", "always_on")
    def always_on(channel, **_):
        return np.ones_like(channel, dtype=bool)

    assert resolve("mask", "always_on") is always_on


def test_model_cache_singleton():
    calls = []

    def loader():
        calls.append(1)
        return object()

    a = cached_model("m1", loader)
    b = cached_model("m1", loader)
    assert a is b and len(calls) == 1


def test_load_events_normalizes_both_ts_encodings(spark, tmp_path):
    """The driver's testdata has stored events.ts as TIMESTAMP(NANOS)
    (read as bigint under nanosAsLong) in some generations and
    timestamp[us] (read as TIMESTAMP_NTZ) in others. load_events must
    deliver identical TIMESTAMP values for both encodings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scip_spark.queries import load_events

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    base = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(micros, pa.timestamp("us")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    ntz_dir = tmp_path / "ntz"
    nanos_dir = tmp_path / "nanos"
    ntz_dir.mkdir(); nanos_dir.mkdir()
    pq.write_table(base, ntz_dir / "events.parquet")
    nanos = base.set_column(
        1, "ts", pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    )
    pq.write_table(nanos, nanos_dir / "events.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    got_ntz = {r.event_id: r.ts for r in load_events(spark, str(ntz_dir)).collect()}
    got_ns = {r.event_id: r.ts for r in load_events(spark, str(nanos_dir)).collect()}
    assert got_ntz == got_ns
    for df in (load_events(spark, str(ntz_dir)), load_events(spark, str(nanos_dir))):
        assert dict(df.dtypes)["ts"] == "timestamp"
