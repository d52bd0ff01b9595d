"""Device-side byte/encoding/digest kernels (exec/bytes_funcs.py) vs Python
stdlib oracles — the checkSparkAnswer differential pattern (reference
kernels: math_funcs/unhex.rs, string_funcs/base64.rs; digest parity with
hashlib/binascii which match Java's MessageDigest/CRC32)."""

import base64 as b64
import hashlib
import zlib

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

STRS = ["hello", "", "The quick brown fox jumps over the lazy dog", None,
        "a", "ab", "abc", "abcd", "x" * 55, "y" * 56, "z" * 64, "w" * 119]
SCHEMA = T.Schema([T.Field("s", T.string(130)), T.Field("v", T.INT64)])
INTS = [0, 1, 255, -1, 1234567890123, -77, 17, 2**62, 42, -(2**40), 7, 100]
DATA = {"s": STRS, "v": np.array(INTS, np.int64)}


def run(expr, name="o"):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    out = s.collect(P.Scan("t", SCHEMA).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def sfn(f, *args):
    return E.StringFunc(f, tuple(args))


class TestHex:
    def test_hex_string(self):
        got = run(sfn("hex", E.col("s")))
        want = [s.encode().hex().upper() if s is not None else None for s in STRS]
        assert got == want

    def test_hex_int(self):
        got = run(sfn("hex", E.col("v")))
        want = [format(v & (2**64 - 1), "X") for v in INTS]
        assert got == want

    def test_unhex_roundtrip(self):
        got = run(sfn("unhex", sfn("hex", E.col("s"))))
        want = [s.encode() if s is not None else None for s in STRS]
        assert got == want

    def test_unhex_odd_and_invalid(self):
        # odd length: implicit leading 0 nibble; invalid digit: NULL
        data = {"s": ["F", "123", "GG", "0aF", None, "", "ff", "123z", "AB", "cd", "09", "7"],
                "v": np.zeros(12, np.int64)}
        s = Session()
        s.register_numpy("t", data, SCHEMA)
        out = s.collect(P.Scan("t", SCHEMA).project([sfn("unhex", E.col("s")).alias("o")]))
        got = [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]
        assert got == [b"\x0f", b"\x01\x23", None, b"\x00\xaf", None, b"",
                       b"\xff", None, b"\xab", b"\xcd", b"\x09", b"\x07"]


class TestBase64:
    def test_base64_nochunk(self):
        got = run(sfn("base64", E.col("s"), E.lit(False)))
        want = [b64.b64encode(s.encode()).decode() if s is not None else None for s in STRS]
        assert got == want

    def test_base64_chunked(self):
        # java.util.Base64 MIME encoder: 76-char lines joined by CRLF
        got = run(sfn("base64", E.col("s")))

        def mime(s):
            e = b64.b64encode(s.encode()).decode()
            return "\r\n".join(e[i:i + 76] for i in range(0, len(e), 76))

        want = [mime(s) if s is not None else None for s in STRS]
        assert got == want

    def test_unbase64(self):
        enc = ["aGVsbG8=", "", "YQ==", "YWI=", "YWJj", None,
               "aGVs\r\nbG8=", "  QUJD  ", "QQ", "QUI", "enp6", "Zm9vYmFy"]
        data = {"s": enc, "v": np.zeros(12, np.int64)}
        s = Session()
        s.register_numpy("t", data, SCHEMA)
        out = s.collect(P.Scan("t", SCHEMA).project([sfn("unbase64", E.col("s")).alias("o")]))
        got = [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]
        assert got == [b"hello", b"", b"a", b"ab", b"abc", None,
                       b"hello", b"ABC", b"A", b"AB", b"zzz", b"foobar"]

    def test_roundtrip_chunked(self):
        got = run(sfn("unbase64", sfn("base64", E.col("s"))))
        want = [s.encode() if s is not None else None for s in STRS]
        assert got == want


class TestBinConv:
    def test_bin(self):
        got = run(sfn("bin", E.col("v")))
        want = [format(v & (2**64 - 1), "b") for v in INTS]
        assert got == want

    def test_conv_basic(self):
        data = {"s": ["100", "ff", "-10", "zz", "1010", None, "0", "99", "7", "", "12at", "-1"],
                "v": np.zeros(12, np.int64)}
        s = Session()
        s.register_numpy("t", data, SCHEMA)

        def conv(frm, to):
            out = s.collect(P.Scan("t", SCHEMA).project(
                [sfn("conv", E.col("s"), E.lit(frm), E.lit(to)).alias("o")]))
            return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]

        # hive/spark conv semantics: parse until first invalid char; '-'
        # means u64 two's complement unless to_base < 0
        assert conv(16, 10) == ["256", "255", str(2**64 - 16), None, "4112", None,
                                "0", "153", "7", None, "298", str(2**64 - 1)]
        assert conv(16, -10) == ["256", "255", "-16", None, "4112", None,
                                 "0", "153", "7", None, "298", "-1"]
        assert conv(10, 2) == ["1100100", None, format(2**64 - 10, "b"), None,
                               "1111110010", None, "0", "1100011", "111", None, "1100", format(2**64 - 1, "b")]
        def base36(txt):
            v = 0
            for c in txt:
                v = v * 36 + int(c, 36)
            return v

        assert conv(36, 16) == [format(base36("100"), "X"), format(base36("ff"), "X"),
                                format(2**64 - base36("10"), "X"), format(base36("zz"), "X"),
                                format(base36("1010"), "X"), None, "0",
                                format(base36("99"), "X"), "7", None,
                                format(base36("12at"), "X"), format(2**64 - 1, "X")]


class TestDigests:
    def test_md5(self):
        got = run(sfn("md5", E.col("s")))
        want = [hashlib.md5(s.encode()).hexdigest() if s is not None else None for s in STRS]
        assert got == want

    def test_sha1(self):
        got = run(sfn("sha1", E.col("s")))
        want = [hashlib.sha1(s.encode()).hexdigest() if s is not None else None for s in STRS]
        assert got == want

    @pytest.mark.parametrize("bits,algo", [(0, "sha256"), (224, "sha224"),
                                           (256, "sha256"), (384, "sha384"), (512, "sha512")])
    def test_sha2(self, bits, algo):
        got = run(sfn("sha2", E.col("s"), E.lit(bits)))
        want = [getattr(hashlib, algo)(s.encode()).hexdigest() if s is not None else None
                for s in STRS]
        assert got == want

    def test_sha2_invalid_bits(self):
        assert run(sfn("sha2", E.col("s"), E.lit(100))) == [None] * len(STRS)

    def test_crc32(self):
        got = run(sfn("crc32", E.col("s")))
        want = [zlib.crc32(s.encode()) if s is not None else None for s in STRS]
        assert got == want


class TestEncodeDecode:
    def test_utf8_identity(self):
        got = run(sfn("decode", sfn("encode", E.col("s"), E.lit("UTF-8")), E.lit("UTF-8")))
        assert got == STRS

    def test_unsupported_charset(self):
        with pytest.raises(NotImplementedError):
            run(sfn("encode", E.col("s"), E.lit("UTF-16")))


class TestDictInput:
    def test_digest_on_dict_column(self):
        # low-cardinality strings stage dictionary-encoded; the digest must
        # run over the K dictionary entries and map back by code
        vals = ["aa", "bb", "aa", None, "cc", "bb"] * 2
        data = {"s": vals, "v": np.zeros(12, np.int64)}
        s = Session()
        s.register_numpy("t", data, SCHEMA)
        out = s.collect(P.Scan("t", SCHEMA).project([sfn("md5", E.col("s")).alias("o")]))
        got = [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]
        want = [hashlib.md5(v.encode()).hexdigest() if v is not None else None for v in vals]
        assert got == want
