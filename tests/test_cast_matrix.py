"""Cast support matrix (CometCast.isSupported analog): probe-derived grid,
generated docs, allowIncompatible gating."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.cast_matrix import (
    MATRIX_TYPES,
    cast_support,
    generate_matrix_doc,
)


def test_numeric_casts_compatible():
    for frm in ("byte", "short", "int", "long", "float", "double"):
        for to in ("byte", "short", "int", "long", "float", "double"):
            lvl, _ = cast_support(frm, to)
            assert lvl == "compatible", (frm, to, lvl)


def test_float_to_string_incompatible_documented():
    lvl, note = cast_support("double", "string")
    assert lvl == "incompatible" and "subnormal" in note
    lvl, _ = cast_support("long", "string")
    assert lvl == "compatible"


def test_full_grid_enumerated_and_doc_generated(tmp_path):
    names = [n for n, _ in MATRIX_TYPES]
    levels = {}
    for f in names:
        for t in names:
            lvl, _ = cast_support(f, t)
            assert lvl in ("compatible", "incompatible", "unsupported")
            levels[(f, t)] = lvl
    # the grid must be mostly implemented: >70% non-unsupported
    implemented = sum(1 for v in levels.values() if v != "unsupported")
    assert implemented / len(levels) > 0.7, implemented
    doc = generate_matrix_doc()
    assert "| from \\ to |" in doc and "Incompatible pairs" in doc
    # refresh the committed doc so it can't go stale silently
    import pathlib

    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "cast_matrix.md"
    out.write_text(doc)


def test_allow_incompatible_gate():
    from datafusion_comet_tpu.conf import CAST_ALLOW_INCOMPATIBLE, CONF
    from datafusion_comet_tpu.exec.registry import gate_reasons
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P

    s = T.Schema([T.Field("x", T.FLOAT64)])
    plan = P.bind_plan(P.Projection(
        P.Scan(table="t", source_schema=s),
        (E.Alias(E.Cast(E.col("x"), T.string(32)), "s"),)))
    assert gate_reasons(plan) == []  # default: allowed
    old = CONF.get(CAST_ALLOW_INCOMPATIBLE)
    try:
        CONF.set(CAST_ALLOW_INCOMPATIBLE, False)
        rs = gate_reasons(plan)
        assert rs and "Incompatible" in rs[0], rs
    finally:
        CONF.set(CAST_ALLOW_INCOMPATIBLE, old)
