"""Native host library tests: staging, radix sort, spill block round-trip."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
from datafusion_comet_tpu.io import native
from datafusion_comet_tpu.io.spill import SpillReader, SpillWriter


class TestNativeLib:
    def test_builds(self):
        # library should build in this image (g++ + zlib are baked in)
        assert native.lib() is not None

    def test_pad_utf8(self):
        strs = [b"hello", b"", b"world!!", b"x"]
        data = b"".join(strs)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        mat, lens = native.pad_utf8_arrow(offsets, np.frombuffer(data, np.uint8), 6)
        np.testing.assert_array_equal(lens, [5, 0, 6, 1])  # world!! truncated
        assert bytes(mat[0][:5]) == b"hello"
        assert bytes(mat[2]) == b"world!"
        assert mat[1].sum() == 0

    def test_pad_utf8_fallback_matches_native(self):
        rng = np.random.default_rng(3)
        strs = [bytes(rng.integers(97, 123, rng.integers(0, 10)).astype(np.uint8)) for _ in range(50)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        m1, l1 = native.pad_utf8_arrow(offsets, data, 10)
        # force numpy fallback
        old = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            m2, l2 = native.pad_utf8_arrow(offsets, data, 10)
        finally:
            native._lib, native._tried = old
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(l1, l2)

    def test_radix_sort(self):
        rng = np.random.default_rng(5)
        keys = rng.integers(0, 2**63, 10000).astype(np.uint64)
        perm = native.radix_sort_u64(keys)
        np.testing.assert_array_equal(keys[perm], np.sort(keys))

    def test_crc_and_zlib(self):
        buf = b"the quick brown fox" * 100
        c = native.crc32(buf)
        import zlib

        assert c == (zlib.crc32(buf) & 0xFFFFFFFF)
        comp = native.zlib_compress(buf)
        assert len(comp) < len(buf)
        assert native.zlib_decompress(comp, len(buf)) == buf


class TestSpill:
    def test_block_roundtrip(self, tmp_path):
        schema = T.Schema(
            [T.Field("a", T.INT64), T.Field("s", T.string(8)), T.Field("v", T.FLOAT64)]
        )
        b = from_numpy(
            {
                "a": np.arange(100, dtype=np.int64),
                "s": np.array([f"r{i}" for i in range(100)], object),
                "v": np.linspace(0, 1, 100),
            },
            schema,
        )
        path = str(tmp_path / "spill.bin")
        w = SpillWriter(path)
        w.write_batch(b)
        w.write_batch(b)
        w.close()
        r = SpillReader(path, schema)
        assert r.num_blocks() == 2
        got = to_numpy(r.read_batch(1))
        orig = to_numpy(b)
        np.testing.assert_array_equal(got["a"], orig["a"])
        assert list(got["s"]) == list(orig["s"])
        np.testing.assert_allclose(got["v"], orig["v"])
