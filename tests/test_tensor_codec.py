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
