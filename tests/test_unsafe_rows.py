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


# -------------------------------------------------------------------------------------
# Nested types (reference: columnar_to_row.rs nested array/struct/map writers;
# Spark UnsafeArrayData / UnsafeMapData / nested UnsafeRow layouts). Oracle:
# independent Python decoders of the nested payload bytes.
# -------------------------------------------------------------------------------------


def _decode_array(buf, elem_dt):
    n = struct.unpack_from("<q", buf, 0)[0]
    words = (n + 63) // 64
    header = 8 + words * 8
    nulls = [struct.unpack_from("<Q", buf, 8 + w * 8)[0] for w in range(words)]
    out = []
    for i in range(n):
        if (nulls[i // 64] >> (i % 64)) & 1:
            out.append(None)
            continue
        if elem_dt.is_binary:
            slot = struct.unpack_from("<q", buf, header + i * 8)[0]
            off = (slot >> 32) & 0x7FFFFFFF
            ln = slot & 0xFFFFFFFF
            out.append(bytes(buf[off:off + ln]).decode())
        else:
            w = elem_dt.np_dtype().itemsize
            fmt = {1: "<b", 2: "<h", 4: "<i", 8: "<q"}[w]
            if elem_dt.type_id == "DOUBLE":
                fmt = "<d"
            elif elem_dt.type_id == "FLOAT":
                fmt = "<f"
            out.append(struct.unpack_from(fmt, buf, header + i * w)[0])
    return out


def _var_payload(row_buf, slot):
    off = (slot >> 32) & 0x7FFFFFFF
    ln = slot & 0xFFFFFFFF
    return row_buf[off:off + ln]


def test_list_of_int_and_string():
    schema = T.Schema([
        T.Field("xs", T.list_(T.INT32, 8)),
        T.Field("ss", T.list_(T.string(6), 4)),
    ])
    xs = [[1, 2, None, 4], [], None, [7], [-5, None], [0] * 8]
    ss = [["a", "bb"], None, ["ccc"], [], [None, "dd"], ["e", None, "f"]]
    batch = from_numpy({"xs": xs, "ss": ss}, schema)
    buf, offsets = batch_to_unsafe_rows(batch)
    dts = [f.dtype for f in schema.fields]
    for r in range(len(xs)):
        row = buf[offsets[r]:offsets[r + 1]]
        nulls = struct.unpack_from("<Q", row, 0)[0]
        for c, (vals, elem) in enumerate([(xs, T.INT32), (ss, T.string(6))]):
            if vals[r] is None:
                assert (nulls >> c) & 1, (r, c)
                continue
            assert not ((nulls >> c) & 1), (r, c)
            slot = struct.unpack_from("<q", row, 8 + c * 8)[0]
            got = _decode_array(_var_payload(row, slot), elem)
            assert got == vals[r], (r, c, got)


def test_struct_of_primitives_and_string():
    st = T.struct(("a", T.INT64), ("b", T.FLOAT64), ("c", T.string(8)))
    schema = T.Schema([T.Field("s", st)])
    rows = [
        {"a": 5, "b": 2.5, "c": "hi"},
        None,
        {"a": -7, "b": None, "c": "worldly"[:7]},
        {"a": None, "b": 0.0, "c": None},
    ]
    batch = from_numpy({"s": rows}, schema)
    buf, offsets = batch_to_unsafe_rows(batch)
    for r, v in enumerate(rows):
        row = buf[offsets[r]:offsets[r + 1]]
        nulls = struct.unpack_from("<Q", row, 0)[0]
        if v is None:
            assert nulls & 1
            continue
        assert not (nulls & 1)
        slot = struct.unpack_from("<q", row, 8)[0]
        sbuf = _var_payload(row, slot)
        snulls = struct.unpack_from("<Q", sbuf, 0)[0]
        got = {}
        got["a"] = None if (snulls >> 0) & 1 else struct.unpack_from("<q", sbuf, 8)[0]
        got["b"] = None if (snulls >> 1) & 1 else struct.unpack_from("<d", sbuf, 16)[0]
        if (snulls >> 2) & 1:
            got["c"] = None
        else:
            cslot = struct.unpack_from("<q", sbuf, 24)[0]
            got["c"] = bytes(_var_payload(sbuf, cslot)).decode()
        assert got == v, (r, got)


def test_map_int_to_string():
    mp = T.map_(T.INT32, T.string(5), 4) if hasattr(T, "map_") else None
    if mp is None:
        import pytest as _pt
        _pt.skip("no map_ constructor")
    schema = T.Schema([T.Field("m", mp)])
    rows = [{1: "a", 2: "bb"}, None, {}, {9: None, 3: "ccc"}]
    batch = from_numpy({"m": rows}, schema)
    buf, offsets = batch_to_unsafe_rows(batch)
    for r, v in enumerate(rows):
        row = buf[offsets[r]:offsets[r + 1]]
        nulls = struct.unpack_from("<Q", row, 0)[0]
        if v is None:
            assert nulls & 1
            continue
        assert not (nulls & 1)
        slot = struct.unpack_from("<q", row, 8)[0]
        mbuf = _var_payload(row, slot)
        ksz = struct.unpack_from("<q", mbuf, 0)[0]
        keys = _decode_array(mbuf[8:8 + ksz], T.INT32)
        vals = _decode_array(mbuf[8 + ksz:], T.string(5))
        assert dict(zip(keys, vals)) == v, (r, keys, vals)


def test_nested_native_matches_fallback(monkeypatch):
    if lib() is None:
        pytest.skip("native lib unavailable")
    schema = T.Schema([T.Field("xs", T.list_(T.INT64, 6)), T.Field("k", T.INT32)])
    data = {"xs": [[1, None, 3], [], None, [2 ** 60]], "k": np.arange(4, dtype=np.int32)}
    batch = from_numpy(data, schema)
    buf_n, off_n = batch_to_unsafe_rows(batch)
    import datafusion_comet_tpu.io.native as N

    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", True)
    buf_p, off_p = batch_to_unsafe_rows(batch)
    np.testing.assert_array_equal(off_n, off_p)
    np.testing.assert_array_equal(buf_n, buf_p)
