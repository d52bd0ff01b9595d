"""f64 bit reconstruction and orderable-limb tests (arithmetic-only paths —
the TPU X64 rewrite has no f64 bitcasts). Subnormals are flushed to zero by
XLA (documented deviation)."""

import numpy as np
import jax.numpy as jnp

from datafusion_comet_tpu.exec.evaluator import _f64_bits_i64
from datafusion_comet_tpu.exec import sortkeys
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu import types as T

MIN_NORMAL = 2.2250738585072014e-308


def daz(v):
    return 0.0 if (v == 0 or abs(v) < MIN_NORMAL) else v


class TestF64Bits:
    def test_bits_vs_numpy(self):
        rng = np.random.default_rng(0)
        edge = np.array(
            [1.5, -2.5, 0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, 1e308,
             MIN_NORMAL, 123.456, -1e-307, 2.0**-1000, 1.0 + 2.0**-52],
            np.float64,
        )
        rand = rng.normal(size=500) * 10.0 ** rng.integers(-300, 300, 500)
        vals = np.concatenate([edge, rand])
        got = np.asarray(_f64_bits_i64(jnp.asarray(vals)))
        expect = np.array([daz(v) for v in vals], np.float64).view(np.int64).copy()
        expect[np.isnan(vals)] = np.int64(0x7FF8000000000000)
        # -0.0 canonicalizes to +0 in our path (hash callers normalize anyway)
        expect[(vals == 0.0)] = 0
        np.testing.assert_array_equal(got, expect)

    def test_order_limbs_total_order(self):
        rng = np.random.default_rng(1)
        edge = [0.0, -0.0, 1.5, -2.5, np.nan, np.inf, -np.inf, 1e-300, -1e-300,
                1e308, -1e308, MIN_NORMAL, 2.0**-1000, 1.0, nextafter := np.nextafter(1.0, 2.0)]
        rand = list(rng.normal(size=300) * 10.0 ** rng.integers(-300, 300, 300))
        vals = np.array(edge + rand, np.float64)
        schema = T.Schema([T.Field("f", T.FLOAT64)])
        b = from_numpy({"f": vals}, schema)
        limbs = sortkeys.column_limbs(b.columns[0])
        n = len(vals)
        L = [np.asarray(l)[:n] for l in limbs]
        order = sorted(range(n), key=lambda i: tuple(int(l[i]) for l in L))

        def spark_key(v):
            v = daz(v)
            if np.isnan(v):
                return (2, 0.0)
            return (1, v) if True else None

        got_seq = [vals[i] for i in order]
        keys = [spark_key(v) for v in got_seq]
        assert keys == sorted(keys), "limb order violates Spark float order"
