"""ANSI error propagation: device-side flags -> QueryExecutionError (the
SparkError/QueryContext -> CometQueryExecutionException pipeline analog)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import QueryExecutionError, Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("x", T.INT64), T.Field("s", T.string(8))])
DATA = {"x": np.array([1, 2**40, -3, 0], np.int64), "s": ["1", "2x", "3", "4"]}


def sess():
    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    return s


def test_ansi_cast_overflow_raises():
    s = sess()
    plan = P.Scan("t", SCHEMA).project([E.col("x").cast(T.INT16, E.EvalMode.ANSI)])
    with pytest.raises(QueryExecutionError, match="CAST_OVERFLOW"):
        s.collect(plan)


def test_ansi_divide_by_zero():
    s = sess()
    expr = E.BinaryOp("mod", E.col("x"), E.col("x"), E.EvalMode.ANSI)
    # x % x with x=0 row → DIVIDE_BY_ZERO
    plan = P.Scan("t", SCHEMA).project([expr])
    with pytest.raises(QueryExecutionError, match="DIVIDE_BY_ZERO"):
        s.collect(plan)


def test_ansi_invalid_string_cast():
    s = sess()
    plan = P.Scan("t", SCHEMA).project([E.col("s").cast(T.INT32, E.EvalMode.ANSI)])
    with pytest.raises(QueryExecutionError, match="CAST_INVALID"):
        s.collect(plan)


def test_legacy_mode_no_raise():
    s = sess()
    plan = P.Scan("t", SCHEMA).project([
        E.col("x").cast(T.INT16).alias("a"),
        E.col("s").cast(T.INT32, E.EvalMode.TRY).alias("b"),
    ])
    out = s.collect(plan)
    assert list(out["b__valid"]) == [True, False, True, True]


def test_error_only_on_live_rows():
    """Errors on filtered-out rows must not fire (QueryContext row scoping)."""
    s = sess()
    plan = (
        P.Scan("t", SCHEMA)
        .filter(E.col("x").between(-10, 10))
        .project([E.col("x").cast(T.INT16, E.EvalMode.ANSI).alias("y")])
    )
    out = s.collect(plan)  # overflowing row was filtered out first
    assert sorted(out["y"]) == [-3, 0, 1]
