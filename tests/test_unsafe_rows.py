"""Columnar -> Spark UnsafeRow serialization (reference: columnar_to_row.rs,
CometNativeColumnarToRowSuite). The oracle is an independent Python decoder
of the UnsafeRow layout: null bitset words, 8-byte slots (sign-extended
ints, raw floats), 8-aligned var-len payloads addressed (offset<<32)|len."""

import struct

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu.io.native import batch_to_unsafe_rows, lib


def decode_row(buf, n_cols, dtypes):
    null_words = (n_cols + 63) // 64
    nulls = [struct.unpack_from("<Q", buf, w * 8)[0] for w in range(null_words)]
    out = []
    for c in range(n_cols):
        if (nulls[c // 64] >> (c % 64)) & 1:
            out.append(None)
            continue
        slot = struct.unpack_from("<q", buf, null_words * 8 + c * 8)[0]
        dt = dtypes[c]
        if dt.is_binary:
            off = (slot >> 32) & 0x7FFFFFFF
            ln = slot & 0xFFFFFFFF
            out.append(bytes(buf[off : off + ln]))
        elif dt.type_id == "DOUBLE":
            out.append(struct.unpack_from("<d", buf, null_words * 8 + c * 8)[0])
        elif dt.type_id == "FLOAT":
            out.append(struct.unpack_from("<f", buf, null_words * 8 + c * 8)[0])
        elif dt.is_boolean:
            out.append(bool(slot & 1))
        else:
            out.append(slot)  # sign-extended int64
    return out


SCHEMA = T.Schema([
    T.Field("i8", T.INT8),
    T.Field("i32", T.INT32),
    T.Field("i64", T.INT64),
    T.Field("f32", T.FLOAT32),
    T.Field("f64", T.FLOAT64),
    T.Field("b", T.BOOL),
    T.Field("s", T.string(12)),
    T.Field("d", T.decimal(12, 2)),
])


def make_batch():
    n = 64
    rng = np.random.default_rng(5)
    data = {
        "i8": rng.integers(-128, 128, n).astype(np.int8),
        "i32": rng.integers(-2**31, 2**31, n).astype(np.int32),
        "i64": rng.integers(-2**62, 2**62, n).astype(np.int64),
        "f32": rng.normal(size=n).astype(np.float32),
        "f64": rng.normal(size=n),
        "b": rng.integers(0, 2, n).astype(bool),
        "s": np.array([f"s{v}" * (v % 4) for v in range(n)], object),
        "d": rng.integers(-10**10, 10**10, n).astype(np.int64),
    }
    validity = {k: rng.random(n) > 0.15 for k in data}
    return data, validity, from_numpy(data, SCHEMA, validity=validity)


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip(use_native, monkeypatch):
    if use_native and lib() is None:
        pytest.skip("native lib unavailable")
    if not use_native:
        import datafusion_comet_tpu.io.native as N

        monkeypatch.setattr(N, "_lib", None)
        monkeypatch.setattr(N, "_tried", True)
    data, validity, batch = make_batch()
    buf, offsets = batch_to_unsafe_rows(batch)
    dtypes = [f.dtype for f in SCHEMA.fields]
    n = 64
    assert len(offsets) == n + 1
    for r in range(n):
        row = buf[offsets[r] : offsets[r + 1]]
        got = decode_row(row, len(dtypes), dtypes)
        for c, name in enumerate(SCHEMA.names):
            if not validity[name][r]:
                assert got[c] is None, (r, name)
                continue
            v = data[name][r]
            if dtypes[c].is_binary:
                assert got[c].decode() == v
            elif dtypes[c].type_id == "FLOAT":
                assert got[c] == pytest.approx(float(v), rel=1e-6)
            elif dtypes[c].type_id == "DOUBLE":
                assert got[c] == float(v)
            elif dtypes[c].is_boolean:
                assert got[c] == bool(v)
            else:
                assert got[c] == int(v), (r, name)


def test_native_matches_fallback(monkeypatch):
    if lib() is None:
        pytest.skip("native lib unavailable")
    _, _, batch = make_batch()
    buf_n, off_n = batch_to_unsafe_rows(batch)
    import datafusion_comet_tpu.io.native as N

    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", True)
    buf_p, off_p = batch_to_unsafe_rows(batch)
    np.testing.assert_array_equal(off_n, off_p)
    np.testing.assert_array_equal(buf_n, buf_p)
