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
