"""Session.validate — the extended-explain fallback-reason surface
(reference: ExtendedExplainInfo, withFallbackReason)."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("x", T.INT32), T.Field("s", T.string(8))])


def sess():
    s = Session()
    s.register_numpy("t", {"x": np.arange(4, dtype=np.int32),
                           "s": np.array(["a", "b", "c", "d"], object)}, SCHEMA)
    return s


def test_supported_plan_empty_reasons():
    s = sess()
    plan = P.Scan("t", SCHEMA).filter(E.col("x") > E.lit(1)).project([E.col("s")])
    assert s.validate(plan) == []


def test_unknown_column():
    s = sess()
    plan = P.Scan("t", SCHEMA).project([E.col("nope")])
    r = s.validate(plan)
    assert len(r) == 1 and "nope" in r[0]


def test_unsupported_expression():
    s = sess()
    plan = P.Scan("t", SCHEMA).project([E.StringFunc("soundex", (E.col("s"),))])
    r = s.validate(plan)
    assert len(r) == 1 and "soundex" in r[0]


def test_validate_does_not_execute():
    s = sess()
    calls = []

    def boom(v):
        calls.append(v)
        return v

    udf = E.PythonUdf(boom, (E.col("x"),), T.INT32)
    plan = P.Scan("t", SCHEMA).project([udf])
    assert s.validate(plan) == []
    assert calls == []  # abstract trace only
