"""Row-preserving operators: filter, project, sort, limit, expand, sample.

Reference analogs: FilterExec/ProjectionExec parameterized with Comet
expressions (planner.rs:1221, :1882 Expand, :1461 Sample, :1479 Sort with
fetch/skip). TPU-first: filter flips mask bits (no dynamic shapes — the
selection-vector design), sort is one multi-limb stable lexsort, expand
tiles the batch by the number of projections.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import sortkeys
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
from datafusion_comet_tpu.exec.evaluator import EvalContext, evaluate, evaluate_predicate
from datafusion_comet_tpu.ir import expr as E

__all__ = ["filter_op", "project_op", "sort_op", "limit_op", "expand_op", "sample_op"]

_DEFAULT_CTX = EvalContext()


def filter_op(batch: Batch, predicate: E.Expr, ctx: EvalContext = _DEFAULT_CTX) -> Batch:
    mask = evaluate_predicate(predicate, batch, ctx)
    return batch.with_mask(mask)


def project_op(
    batch: Batch, exprs: Sequence[E.Expr], out_schema: T.Schema, ctx: EvalContext = _DEFAULT_CTX
) -> Batch:
    cols = tuple(evaluate(x, batch, ctx) for x in exprs)
    return Batch(cols, batch.row_mask, out_schema)


def sort_op(
    batch: Batch,
    orders: Sequence[E.SortOrder],
    fetch: Optional[int] = None,
    skip: int = 0,
    ctx: EvalContext = _DEFAULT_CTX,
) -> Batch:
    """Total sort; live rows end up front-packed in sort order. fetch/skip
    trim via the mask (reference: Sort carries limit+offset,
    planner.rs:1479-1512)."""
    limbs = [(~batch.row_mask).astype(jnp.int32)]
    for o in orders:
        cv = evaluate(o.child, batch, ctx)
        limbs += sortkeys.order_limbs(cv, o.ascending, o.resolved_nulls_first(), batch.row_mask)
    perm = sortkeys.lexsort(limbs)
    n = batch.num_rows()
    pos = jnp.arange(batch.capacity)
    mask = pos < n
    if skip:
        mask = mask & (pos >= skip)
    if fetch is not None:
        mask = mask & (pos < skip + fetch)
    return batch.take(perm, mask)


def limit_op(batch: Batch, limit: int, offset: int = 0) -> Batch:
    """Keep rows [offset, offset+limit) among live rows, preserving order."""
    rank = jnp.cumsum(batch.row_mask.astype(jnp.int32)) - 1  # per-live-row rank
    keep = batch.row_mask & (rank >= offset) & (rank < offset + limit)
    return batch.with_mask(keep)


def expand_op(
    batch: Batch,
    projections: Sequence[Sequence[E.Expr]],
    out_schema: T.Schema,
    ctx: EvalContext = _DEFAULT_CTX,
) -> Batch:
    """Each input row emits one row per projection list (ROLLUP/CUBE,
    reference: operators/expand.rs). Output capacity = cap * n_proj."""
    n_proj = len(projections)
    pieces = []
    for proj in projections:
        cols = tuple(evaluate(x, batch, ctx) for x in proj)
        pieces.append(Batch(cols, batch.row_mask, out_schema))
    # interleave: out[i*nproj + j] = piece_j[i] — keeps per-input-row grouping
    out_cols = []
    for ci in range(len(out_schema.fields)):
        datas = [p.columns[ci].data for p in pieces]
        vals = [p.columns[ci].validity for p in pieces]
        lens = [p.columns[ci].lengths for p in pieces]
        data = jnp.stack(datas, axis=1).reshape((-1,) + datas[0].shape[1:])
        val = jnp.stack(vals, axis=1).reshape(-1)
        ln = None if lens[0] is None else jnp.stack(lens, axis=1).reshape(-1)
        out_cols.append(ColumnVector(data, val, ln, out_schema.fields[ci].dtype))
    mask = jnp.repeat(batch.row_mask, n_proj)
    return Batch(tuple(out_cols), mask, out_schema)


def sample_op(
    batch: Batch,
    lower_bound: float,
    upper_bound: float,
    with_replacement: bool,
    seed: int,
    partition_id: int = 0,
) -> Batch:
    """Bernoulli sample without replacement (reference: planner.rs:1461,
    nondetermenistic_funcs bernoulli sampler). Uses jax PRNG (not Spark's
    XORShift — row membership differs but distribution matches; documented
    incompatibility like reference's allowIncompatible exprs)."""
    assert not with_replacement, "with_replacement sampling not implemented"
    key = jax.random.PRNGKey(seed + partition_id)
    u = jax.random.uniform(key, (batch.capacity,))
    keep = (u >= lower_bound) & (u < upper_bound)
    return batch.with_mask(batch.row_mask & keep)
