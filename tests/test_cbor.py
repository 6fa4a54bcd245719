import numpy as np
import pytest

from pyisingmontecarlo_tpu.utils import cbor


@pytest.mark.parametrize(
    "obj",
    [
        None,
        True,
        False,
        0,
        23,
        24,
        255,
        256,
        65535,
        65536,
        2**32,
        2**63 - 1,
        -1,
        -24,
        -25,
        -(2**32),
        1.5,
        -3.25,
        b"",
        b"bytes",
        "",
        "text éü",
        [],
        [1, [2, [3]]],
        {},
        {"a": 1, "b": [True, None]},
    ],
)
def test_roundtrip_scalars(obj):
    assert cbor.loads(cbor.dumps(obj)) == obj


def test_roundtrip_numpy():
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    out = cbor.loads(cbor.dumps(arr))
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, arr)
    barr = np.array([[True, False], [False, True]])
    np.testing.assert_array_equal(cbor.loads(cbor.dumps(barr)), barr)


def test_roundtrip_nested_structure():
    obj = [3, [[[0, 1], -1.0], [[1, 2], 0.5]], 1.0, None, True, {"k": b"v"}]
    out = cbor.loads(cbor.dumps(obj))
    assert out == obj


def test_truncated_raises():
    data = cbor.dumps([1, 2, 3])
    with pytest.raises(ValueError):
        cbor.loads(data[:-1])
    with pytest.raises(ValueError):
        cbor.loads(data + b"\x00")


def test_file_io_error():
    with pytest.raises(IOError):
        cbor.load("/nonexistent/path/x.cbor")
    with pytest.raises(IOError):
        cbor.dump([1], "/nonexistent/path/x.cbor")
