"""Host-side scalar UDF bridge via ``jax.pure_callback``.

The analog of the reference's JVM UDF callback path (reference:
native/spark-expr/src/jvm_udf/mod.rs:38 JvmScalarUdfExpr +
jni-bridge/src/comet_udf_bridge.rs:29 — native execution calls back into the
JVM per batch, marshalling Arrow data across the boundary). Here the "other
runtime" is host Python: the whole argument batch crosses once per callback
(not per row), rows are decoded to Python values, the UDF runs row-at-a-time,
and the results re-enter the device as a padded ColumnVector.

This is deliberately the engine's escape hatch — the same transition-cost
concern as the reference's C2R/R2C boundary applies (see
RevertNativeForTransitionHeavyStages) — and also powers the exact-semantics
host implementations of regexp_extract/replace, split and get_json_object.
"""

from __future__ import annotations

import jax
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector, nested_from_py, nested_to_py
from datafusion_comet_tpu.ir import expr as E

__all__ = ["eval_python_udf", "host_eval_udf"]


def host_eval_udf(e: E.PythonUdf, batch: Batch) -> ColumnVector:
    """Eager (outside-jit) UDF evaluation over a materialized batch — the
    staged-transition path for backends without in-graph callbacks (see
    engine._stage_udfs). Argument expressions are compiled into one small
    jitted program; decode/compute/encode happen on the host."""
    from datafusion_comet_tpu.exec.evaluator import EvalContext, evaluate

    ctx = EvalContext()
    arg_fn = jax.jit(lambda bt: tuple(evaluate(a, bt, ctx) for a in e.args))
    arg_cvs = arg_fn(batch)
    cap = batch.capacity
    mask = np.asarray(batch.row_mask)
    idx = np.arange(cap)
    if getattr(e, "batch_fn", None) is not None and \
            getattr(e, "batch_mode", "py") == "raw":
        raw = [jax.tree_util.tree_map(np.asarray, cv) for cv in arg_cvs]
        results = e.batch_fn(mask, *raw)
    else:
        cols = [nested_to_py(cv, idx) for cv in arg_cvs]
        results = _run_udf(e, mask, cols, cap)
    if isinstance(results, ColumnVector):  # fully-columnar batch_fn
        return results
    return nested_from_py(results, e.out_dtype, cap)


def _run_udf(e: E.PythonUdf, mask, cols, cap):
    """Columnar batch_fn when the UDF provides one (it may return either a
    list of python values or a ready ColumnVector), else the row loop."""
    if getattr(e, "batch_fn", None) is not None:
        return e.batch_fn(mask, *cols)
    results = []
    for i in range(cap):
        if not mask[i]:
            results.append(None)
            continue
        results.append(e.fn(*[c[i] for c in cols]))
    return results


def _template(dtype: T.DataType, cap: int):
    cv = nested_from_py([], dtype, cap)
    return jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), cv)


def eval_python_udf(e: E.PythonUdf, b: Batch, ctx, ev) -> ColumnVector:
    arg_cvs = tuple(ev(a, b, ctx) for a in e.args)
    cap = b.capacity

    def cb(mask, *cvs):
        if getattr(e, "batch_fn", None) is not None and \
                getattr(e, "batch_mode", "py") == "raw":
            raw = [jax.tree_util.tree_map(np.asarray, cv) for cv in cvs]
            results = e.batch_fn(mask, *raw)
        else:
            idx = np.arange(cap)
            cols = [nested_to_py(cv, idx) for cv in cvs]
            results = _run_udf(e, mask, cols, cap)
        out_cv = (results if isinstance(results, ColumnVector)
                  else nested_from_py(results, e.out_dtype, cap))
        return jax.tree_util.tree_map(np.asarray, out_cv)

    out = jax.pure_callback(cb, _template(e.out_dtype, cap), b.row_mask, *arg_cvs)
    return out
