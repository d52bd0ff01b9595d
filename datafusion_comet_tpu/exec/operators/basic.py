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

__all__ = [
    "filter_op",
    "project_op",
    "sort_op",
    "limit_op",
    "expand_op",
    "explode_op",
    "sample_op",
]

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
    planner.rs:1479-1512).

    Fixed-width column buffers are CARRIED THROUGH the variadic lax.sort as
    payloads (near-bandwidth on TPU) instead of gathered afterwards (~15×
    slower, measured — see aggregate._segments); only var-width byte
    matrices fall back to a permutation gather."""
    cap = batch.capacity
    limbs = [(~batch.row_mask).astype(jnp.int32)]
    for o in orders:
        cv = evaluate(o.child, batch, ctx)
        limbs += sortkeys.order_limbs(cv, o.ascending, o.resolved_nulls_first(), batch.row_mask)
    payloads: list = []
    slot_of = {}
    for ci, c in enumerate(batch.columns):
        if c.data.ndim == 1 and c.lengths is None and not c.children:
            slot_of[ci] = len(payloads)
            payloads.append(c.data)
            payloads.append(c.validity)
    nk = len(limbs)
    iota = jnp.arange(cap, dtype=jnp.int32)
    out = jax.lax.sort(
        tuple(limbs) + (iota,) + tuple(payloads), num_keys=nk, is_stable=True
    )
    perm = out[nk]
    sp = out[nk + 1 :]
    cols = []
    for ci, c in enumerate(batch.columns):
        if ci in slot_of:
            s = slot_of[ci]
            cols.append(ColumnVector(sp[s], sp[s + 1], None, c.dtype,
                                     dictionary=c.dictionary))
        else:
            cols.append(c.take(perm))
    n = batch.num_rows()
    pos = jnp.arange(cap)
    mask = pos < n
    if skip:
        mask = mask & (pos >= skip)
    if fetch is not None:
        mask = mask & (pos < skip + fetch)
    return Batch(tuple(cols), mask, batch.schema)


def compact_batch(batch: Batch, new_cap: int):
    """Pack live rows to the front and shrink capacity to ``new_cap``.
    Returns (compacted batch, overflow flag: live rows didn't fit).

    Fixed-width buffers ride the compaction sort as payloads; the slice to
    ``new_cap`` then costs nothing. This is what keeps chained joins LINEAR
    in capacity: every hash join emits a (probe×K) pair block that is mostly
    dead, and without compaction the K factors multiply down the chain."""
    cap = batch.capacity
    if new_cap >= cap:
        return batch, jnp.zeros((), bool)
    keys = [(~batch.row_mask).astype(jnp.int32)]
    payloads = []
    slot_of = {}
    for ci, c in enumerate(batch.columns):
        if c.data.ndim == 1 and c.lengths is None and not c.children:
            slot_of[ci] = len(payloads)
            payloads.append(c.data)
            payloads.append(c.validity)
    iota = jnp.arange(cap, dtype=jnp.int32)
    out = jax.lax.sort(tuple(keys) + (iota,) + tuple(payloads) + (batch.row_mask,),
                       num_keys=1, is_stable=True)
    perm = out[1]
    sp = out[2:-1]
    sorted_mask = out[-1]
    n_live = jnp.sum(batch.row_mask.astype(jnp.int32))
    overflow = n_live > new_cap
    cols = []
    perm_slice = perm[:new_cap]
    for ci, c in enumerate(batch.columns):
        if ci in slot_of:
            s = slot_of[ci]
            cols.append(ColumnVector(sp[s][:new_cap], sp[s + 1][:new_cap], None,
                                     c.dtype, dictionary=c.dictionary))
        else:
            cols.append(c.take(perm_slice))
    return Batch(tuple(cols), sorted_mask[:new_cap], batch.schema), overflow


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
        branch = [p.columns[ci] for p in pieces]
        branch = branch[0].unify_encoding(*branch[1:])
        datas = [c.data for c in branch]
        # projections may disagree on byte-matrix width (e.g. a typed null
        # literal vs a scanned column): pad to the widest before stacking
        if datas[0].ndim == 2:
            w = max(d.shape[1] for d in datas)
            datas = [jnp.pad(d, ((0, 0), (0, w - d.shape[1]))) if d.shape[1] < w else d
                     for d in datas]
        vals = [c.validity for c in branch]
        lens = [c.lengths for c in branch]
        data = jnp.stack(datas, axis=1).reshape((-1,) + datas[0].shape[1:])
        val = jnp.stack(vals, axis=1).reshape(-1)
        ln = None if lens[0] is None else jnp.stack(lens, axis=1).reshape(-1)
        out_cols.append(ColumnVector(data, val, ln, out_schema.fields[ci].dtype,
                                     dictionary=branch[0].dictionary))
    mask = jnp.repeat(batch.row_mask, n_proj)
    return Batch(tuple(out_cols), mask, out_schema)


def explode_op(
    batch: Batch,
    expr: E.Expr,
    out_schema: T.Schema,
    outer: bool = False,
    pos: bool = False,
    ctx: EvalContext = _DEFAULT_CTX,
) -> Batch:
    """explode/posexplode(_outer) over a LIST or MAP column (reference:
    planner.rs:1918 Explode arm). Static shapes: out[r*E + e] = element e of
    row r, live iff e < len(r); ``outer`` keeps a single null-element row for
    null/empty inputs. Repeated child columns via an index gather XLA fuses
    with downstream ops."""
    arr = evaluate(expr, batch, ctx)
    cap = batch.capacity
    E_ = arr.children[0].validity.shape[1]
    lens = arr.data
    pos_mat = jnp.broadcast_to(jnp.arange(E_, dtype=jnp.int32)[None, :], (cap, E_))
    live = pos_mat < lens[:, None]
    gen_valid = jnp.ones((cap, E_), bool)
    if outer:
        # empty or null input → keep slot 0 with a null generated value
        empty = (~arr.validity) | (lens == 0)
        live = live | (empty[:, None] & (pos_mat == 0))
        gen_valid = gen_valid & ~empty[:, None]
    row_live = (live & batch.row_mask[:, None]).reshape(cap * E_)
    src = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), E_)
    out_cols = [c.take(src) for c in batch.columns]
    flat = lambda a: a.reshape((cap * E_,) + a.shape[2:])  # noqa: E731
    if pos:
        out_cols.append(
            ColumnVector(flat(pos_mat), flat(gen_valid), None, T.INT32)
        )

    def flat_cv(cv: ColumnVector) -> ColumnVector:
        from datafusion_comet_tpu.exec.nested import _map_elem

        return _map_elem(cv, lambda a: None if a is None else flat(a))

    elem = arr.children[0]
    if expr.dtype.is_map:
        key_cv, val_cv = elem.children
        kf = flat_cv(key_cv)
        vf = flat_cv(val_cv)
        out_cols.append(kf.with_validity(kf.validity & flat(gen_valid)))
        out_cols.append(vf.with_validity(vf.validity & flat(gen_valid)))
    else:
        ef = flat_cv(elem)
        out_cols.append(ef.with_validity(ef.validity & flat(gen_valid)))
    return Batch(tuple(out_cols), row_live, out_schema)


def sample_op(
    batch: Batch,
    lower_bound: float,
    upper_bound: float,
    with_replacement: bool,
    seed: int,
    partition_id: int = 0,
) -> Batch:
    """Bernoulli / Poisson sampling (reference: planner.rs:1461,
    nondetermenistic_funcs/bernoulli_cell_sampler.rs + Spark PoissonSampler).

    Without replacement is Spark-EXACT: one XORShiftRandom.nextDouble() per
    live row (seeded ``hashSeed(seed + partition)``), keep when
    ``lb <= x < ub`` — the BernoulliCellSampler contract, so row membership
    matches Spark and complementary ranges partition rows (the randomSplit
    property). An empty range selects nothing without consuming draws
    (bernoulli_cell_sampler.rs:44 ``selects_nothing``).

    with_replacement keeps the jax-PRNG Poisson (Spark's PoissonSampler uses
    commons-math; distribution matches, membership differs — documented):
    per-row copy count ~ Poisson(fraction), materialized into a static
    (cap × K) expansion with K = ceil(fraction) + 3 (counts beyond K are
    truncated — a ~1e-4 tail at fraction ≤ 1; static shapes)."""
    if not with_replacement:
        if upper_bound - lower_bound <= 0.0:
            return batch.with_mask(jnp.zeros_like(batch.row_mask))
        from datafusion_comet_tpu.exec import random_xorshift as RX

        u = RX.rand_column(RX.init_seed_host(seed, partition_id), batch.row_mask).data
        keep = (u >= lower_bound) & (u < upper_bound)
        return batch.with_mask(batch.row_mask & keep)
    key = jax.random.PRNGKey(seed + partition_id)
    fraction = upper_bound - lower_bound
    cap = batch.capacity
    K = max(1, int(np.ceil(fraction)) + 3)
    counts = jnp.minimum(
        jax.random.poisson(key, fraction, (cap,)).astype(jnp.int32), K
    )
    copy = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (cap, K))
    live = (copy < counts[:, None]) & batch.row_mask[:, None]
    src = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), K)
    out = batch.take(src, live.reshape(cap * K))
    return out
