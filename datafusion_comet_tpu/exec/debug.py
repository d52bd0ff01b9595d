"""Per-batch invariant checker (the DebugBatchStream analog).

Reference: native/core/src/debug/debug_batch_stream.rs wraps every operator
stream in debug mode and validates each batch flowing between operators
(jni_api.rs:697 validate_full). Here the fused engine has no per-batch
stream, but every operator returns a Batch during tracing — so the checks
run at TRACE time on shapes/dtypes/structure (free: no device work) and,
for concrete (non-traced) arrays, on values too.

Enable with ``comet.debug.validateBatches``; the engine calls
``check_batch`` after every operator and raises ``BatchInvariantError``
naming the operator and the violated invariant.
"""

from __future__ import annotations

import numpy as np

from datafusion_comet_tpu import types as T

__all__ = ["check_batch", "BatchInvariantError"]


class BatchInvariantError(AssertionError):
    pass


def _fail(op: str, msg: str):
    raise BatchInvariantError(f"[{op}] {msg}")


def _is_concrete(a) -> bool:
    import jax

    return not isinstance(a, jax.core.Tracer)


def check_batch(batch, op: str = "?") -> None:
    cap = batch.row_mask.shape[0]
    if batch.row_mask.dtype != np.bool_:
        _fail(op, f"row_mask dtype {batch.row_mask.dtype} != bool")
    if batch.schema is not None and len(batch.schema.fields) != len(batch.columns):
        _fail(op, f"schema arity {len(batch.schema.fields)} != "
                  f"{len(batch.columns)} columns")
    fields = batch.schema.fields if batch.schema is not None else [None] * len(batch.columns)
    for f, cv in zip(fields, batch.columns):
        name = f.name if f is not None else "?"
        if cv.validity.shape[0] != cap:
            _fail(op, f"{name}: validity rows {cv.validity.shape[0]} != capacity {cap}")
        if cv.validity.dtype != np.bool_:
            _fail(op, f"{name}: validity dtype {cv.validity.dtype}")
        if cv.data.shape[0] != cap:
            _fail(op, f"{name}: data rows {cv.data.shape[0]} != capacity {cap}")
        if f is not None and not cv.is_dict and not f.dtype.is_nested:
            if f.dtype.is_binary:
                if cv.data.ndim != 2 or cv.data.dtype != np.uint8:
                    _fail(op, f"{name}: binary column must be (rows, w) uint8, "
                              f"got {cv.data.shape} {cv.data.dtype}")
                if cv.lengths is None:
                    _fail(op, f"{name}: binary column missing lengths")
                if cv.data.shape[1] > f.dtype.byte_width:
                    _fail(op, f"{name}: byte plane wider than dtype "
                              f"({cv.data.shape[1]} > {f.dtype.byte_width})")
            elif cv.lengths is not None:
                _fail(op, f"{name}: non-binary column carries lengths")
        if cv.is_dict and cv.data.dtype not in (np.int32, np.dtype("int32")):
            _fail(op, f"{name}: dict codes dtype {cv.data.dtype} != int32")
        # value checks only when concrete (outside jit)
        if cv.lengths is not None and _is_concrete(cv.lengths) and cv.data.ndim == 2:
            ln = np.asarray(cv.lengths)
            if ln.size and (ln.min() < 0 or ln.max() > cv.data.shape[1]):
                _fail(op, f"{name}: lengths outside [0, {cv.data.shape[1]}] "
                          f"(min {ln.min()}, max {ln.max()})")
        if cv.is_dict and _is_concrete(cv.data):
            codes = np.asarray(cv.data)
            if codes.size and (codes.min() < 0 or codes.max() >= max(cv.dictionary.size, 1)):
                _fail(op, f"{name}: dict code out of range "
                          f"[0, {cv.dictionary.size})")
