import numpy as np

from scip_spark.schema import decode_tensor, encode_tensor


def test_roundtrip():
    a = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    flat, shape = encode_tensor(a)
    assert shape == [3, 4, 5]
    b = decode_tensor(flat, shape)
    np.testing.assert_array_equal(a, b)


def test_none_safe():
    assert decode_tensor(None, None) is None


def test_ragged_roundtrip_through_spark(spark):
    """Ragged H×W per record — the zarr layout the codec mirrors."""
    import pandas as pd

    arrs = [np.random.RandomState(i).rand(2, 4 + i, 5 + i).astype(np.float32) for i in range(3)]
    rows = [{"pixels": a.ravel().tolist(), "pixels_shape": list(a.shape)} for a in arrs]
    df = spark.createDataFrame(pd.DataFrame(rows), schema="pixels array<float>, pixels_shape array<int>")
    back = df.toPandas()
    for a, (_, r) in zip(arrs, back.iterrows()):
        np.testing.assert_allclose(a, decode_tensor(r.pixels, r.pixels_shape), rtol=1e-6)


def test_binary_codec_roundtrip_and_equivalence():
    import numpy as np

    from scip_spark.schema import (
        decode_series_bin,
        decode_tensor,
        decode_tensor_bin,
        encode_series_bin,
        encode_tensor,
        encode_tensor_bin,
    )

    rng = np.random.default_rng(3)
    a = (rng.random((3, 17, 23)) * 100).astype(np.float32)
    buf, shape = encode_tensor_bin(a)
    np.testing.assert_array_equal(decode_tensor_bin(buf, shape), a)
    # binary and list codecs decode to identical tensors
    flat, shape2 = encode_tensor(a)
    np.testing.assert_array_equal(decode_tensor(flat, shape2), decode_tensor_bin(buf, shape))
    import pandas as pd

    bufs, shapes = encode_series_bin([a, None, a[0]])
    back = decode_series_bin(bufs, shapes)
    np.testing.assert_array_equal(back[0], a)
    assert back[1] is None
    np.testing.assert_array_equal(back[2], a[0])


def test_binary_layout_roundtrip_through_spark(spark):
    """array→binary→array through mapInPandas preserves every tensor
    (incl. nulls and ragged shapes) — the at-scale layout can be
    adopted and reverted freely mid-plan."""
    import numpy as np
    import pandas as pd

    from scip_spark.schema import (
        EVENT_SCHEMA,
        decode_tensor,
        events_to_pandas,
        pixels_to_array,
        pixels_to_binary,
    )

    recs = [
        {"path": "a", "group": "g", "pixels": np.arange(12, dtype=np.float32).reshape(1, 3, 4)},
        {"path": "b", "group": "g", "pixels": None},
        {"path": "c", "group": "g", "pixels": np.ones((2, 5, 7), dtype=np.float32)},
    ]
    df = spark.createDataFrame(events_to_pandas(recs), schema=EVENT_SCHEMA)
    binified = pixels_to_binary(df)
    assert dict(binified.dtypes)["pixels_bin"] == "binary"
    back = pixels_to_array(binified).select("path", "pixels", "pixels_shape").toPandas()
    by_path = {r.path: r for r in back.itertuples()}
    np.testing.assert_array_equal(
        decode_tensor(by_path["a"].pixels, by_path["a"].pixels_shape),
        recs[0]["pixels"],
    )
    assert by_path["b"].pixels is None or (
        isinstance(by_path["b"].pixels, float) and pd.isna(by_path["b"].pixels)
    )
    np.testing.assert_array_equal(
        decode_tensor(by_path["c"].pixels, by_path["c"].pixels_shape),
        recs[2]["pixels"],
    )


def test_ndarray_encode_avoids_per_element_objects():
    """Both codecs must avoid per-element Python objects: the array
    codec now keeps ndarray elements (Arrow converts a primitive
    ndarray in one buffer copy), so encoding must beat an explicit
    ``.tolist()`` materialization by a wide margin."""
    import time

    import numpy as np

    from scip_spark.schema import encode_series, encode_series_bin

    rng = np.random.default_rng(0)
    arrays = [rng.random((3, 64, 64)).astype(np.float32) for _ in range(200)]

    t0 = time.time()
    flats, _ = encode_series(arrays)
    t_nd = time.time() - t0
    assert all(isinstance(v, np.ndarray) for v in flats)  # no tolist regression

    t0 = time.time()
    encode_series_bin(arrays)
    t_bin = time.time() - t0

    t0 = time.time()
    [a.ravel().tolist() for a in arrays]
    t_list = time.time() - t0

    assert t_nd * 3 < t_list, (t_nd, t_list)
    assert t_bin * 3 < t_list, (t_bin, t_list)
