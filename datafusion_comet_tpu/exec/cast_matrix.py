"""Cast support matrix: Compatible / Incompatible / Unsupported per type pair.

Reference contract: CometCast.isSupported(from, to, timezone, evalMode)
returns a SupportLevel per pair (spark/.../expressions/CometCast.scala:175,
SupportLevel.scala:27-45); incompatible pairs need
``spark.comet.expression.Cast.allowIncompatible=true``. This module is the
engine's authoritative equivalent:

- ``cast_support(frm, to)`` probes the ACTUAL kernel (jax.eval_shape over
  the evaluator's Cast path — an unimplemented pair raises) and overlays
  the known-deviation list, so the matrix can never drift from the code;
- ``generate_matrix_doc()`` renders the full grid into markdown
  (docs/cast_matrix.md, refreshed by tests);
- gate_reasons() consults it: an Incompatible pair is a fallback reason
  unless ``comet.expression.Cast.allowIncompatible`` is on.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from datafusion_comet_tpu import types as T

__all__ = ["cast_support", "generate_matrix_doc", "MATRIX_TYPES"]

MATRIX_TYPES = [
    ("boolean", T.BOOL),
    ("byte", T.INT8),
    ("short", T.INT16),
    ("int", T.INT32),
    ("long", T.INT64),
    ("float", T.FLOAT32),
    ("double", T.FLOAT64),
    ("decimal(10,2)", T.decimal(10, 2)),
    ("decimal(38,10)", T.decimal(38, 10)),
    ("date", T.DATE),
    ("timestamp", T.TIMESTAMP),
    ("timestamp_ntz", T.TIMESTAMP_NTZ),
    ("string", T.string(64)),
]

# Pairs whose kernel exists but deviates from Spark in documented corners
# (docs/compatibility.md) — the CometCast "Incompatible" tier.
_INCOMPATIBLE: Dict[Tuple[str, str], str] = {
    ("float", "string"): "subnormals print 0.0 (XLA DAZ flush)",
    ("double", "string"): "subnormals print 0.0 (XLA DAZ flush)",
    ("string", "timestamp"): "fractional-zone offsets (e.g. +05:30) via "
                             "fixed-offset table only",
    ("string", "timestamp_ntz"): "same parser caveats as string->timestamp",
    ("double", "decimal(38,10)"): "values needing >2^53 integer precision "
                                  "round through f64 first",
    ("float", "decimal(38,10)"): "rounds through f64 first",
}

_CACHE: Dict[Tuple[str, str], Tuple[str, str]] = {}


def cast_support(frm_name: str, to_name: str) -> Tuple[str, str]:
    """('compatible'|'incompatible'|'unsupported', note) for a named pair."""
    key = (frm_name, to_name)
    if key in _CACHE:
        return _CACHE[key]
    frm = dict(MATRIX_TYPES)[frm_name]
    to = dict(MATRIX_TYPES)[to_name]
    if frm == to:
        _CACHE[key] = ("compatible", "identity")
        return _CACHE[key]
    level_note = _probe(frm, to)
    if level_note[0] == "compatible" and key in _INCOMPATIBLE:
        level_note = ("incompatible", _INCOMPATIBLE[key])
    _CACHE[key] = level_note
    return level_note


def support_for_types(frm: T.DataType, to: T.DataType) -> Tuple[str, str]:
    """Support level for arbitrary dtypes (maps onto the named grid)."""
    def name_of(dt: T.DataType) -> Optional[str]:
        for n, t in MATRIX_TYPES:
            if t.type_id == dt.type_id and not dt.is_decimal and not dt.is_binary:
                return n
        if dt.is_decimal:
            return "decimal(38,10)" if dt.is_wide_decimal else "decimal(10,2)"
        if dt.type_id == "STRING":
            return "string"
        return None

    fn, tn = name_of(frm), name_of(to)
    if fn is None or tn is None:
        return ("compatible", "")  # outside the audited grid: not gated
    return cast_support(fn, tn)


def _probe(frm: T.DataType, to: T.DataType) -> Tuple[str, str]:
    import jax

    from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
    from datafusion_comet_tpu.exec.evaluator import evaluate
    from datafusion_comet_tpu.ir import expr as E

    schema = T.Schema([T.Field("x", frm)])

    def fn():
        import jax.numpy as jnp
        import numpy as np

        cap = 8
        if frm.is_binary:
            cv = ColumnVector(jnp.zeros((cap, frm.byte_width), jnp.uint8),
                              jnp.ones(cap, bool), jnp.zeros(cap, jnp.int32), frm)
        else:
            cv = ColumnVector(jnp.zeros(cap, frm.np_dtype()),
                              jnp.ones(cap, bool), None, frm)
        b = Batch((cv,), jnp.ones(cap, bool), schema)
        e = E.bind(E.Cast(E.col("x"), to), schema)
        out = evaluate(e, b)
        return out.data

    try:
        jax.eval_shape(fn)
        return ("compatible", "")
    except NotImplementedError as e:
        return ("unsupported", str(e)[:80])
    except Exception as e:  # type/shape errors = pair not expressible
        return ("unsupported", f"{type(e).__name__}")


def generate_matrix_doc() -> str:
    names = [n for n, _ in MATRIX_TYPES]
    lines = [
        "# Cast support matrix",
        "",
        "Generated from the live kernels by "
        "`datafusion_comet_tpu.exec.cast_matrix.generate_matrix_doc()` "
        "(probe: jax.eval_shape over the evaluator Cast path) — the "
        "CometCast.isSupported analog (CometCast.scala:175). Legend: "
        "**C** compatible, **I** incompatible (documented deviation; needs "
        "`comet.expression.Cast.allowIncompatible`), **U** unsupported.",
        "",
        "| from \\ to | " + " | ".join(names) + " |",
        "|---|" + "---|" * len(names),
    ]
    notes = []
    for fn_ in names:
        row = [fn_]
        for tn in names:
            lvl, note = cast_support(fn_, tn)
            row.append({"compatible": "C", "incompatible": "I",
                        "unsupported": "U"}[lvl])
            if lvl == "incompatible":
                notes.append(f"- `{fn_} -> {tn}`: {note}")
        lines.append("| " + " | ".join(row) + " |")
    lines += ["", "## Incompatible pairs", ""] + sorted(set(notes)) + [""]
    return "\n".join(lines)
