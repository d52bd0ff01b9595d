"""Expression evaluator: bound expression IR → fused XLA computation.

The TPU analog of the reference's DataFusion PhysicalExpr tree + Comet's
Spark-semantics kernels (reference: native/core/src/execution/planner.rs:437
``create_expr`` dispatch; native/spark-expr/src/** kernel library). Instead
of interpreting per-row, every expression compiles into pure jnp ops over
the Batch's SoA arrays, so an entire filter/projection pipeline fuses into
one XLA computation (VPU for elementwise work, MXU untouched).

Spark semantics implemented here:
- three-valued logic via validity vectors; Kleene AND/OR
  (reference: predicate semantics in datafusion + spark-expr);
- NaN ordering: NaN == NaN, NaN greater than all (reference:
  CometExecRule.scala:548 normalizes NaN; comparator semantics in spark-expr);
- decimal arithmetic on scaled int64 with exact i128 intermediates and
  HALF_UP rescaling (reference: spark-expr/src/math_funcs/, uses Rust i128);
- LEGACY/ANSI/TRY eval modes with an error side-channel
  (reference: spark-expr/src/lib.rs:102 EvalMode, error.rs SparkError).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector, quantize_bound
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.utils import int128

__all__ = ["EvalContext", "evaluate", "evaluate_predicate"]


@dataclasses.dataclass
class EvalContext:
    partition_id: int = 0
    num_partitions: int = 1
    batch_row_offset: int = 0
    subquery_values: Optional[Dict[int, Tuple[object, bool]]] = None
    # ANSI error side channel: list of (flag_array(bool cap), message)
    errors: Optional[List[Tuple[jax.Array, str]]] = None
    # live-row mask of the batch currently being evaluated (set by
    # evaluate()); errors on dead rows must not fire — the reference's
    # QueryContext scopes errors to rows the operator actually processed
    row_mask: Optional[jax.Array] = None
    # capacity-overflow side channel shared with the engine's re-planning
    # loop (join fan-out, aggregate group capacity — the AQE-style adaptive
    # re-plan); operators append boolean flags
    overflow_flags: Optional[List] = None
    # multiplier applied to static capacities on re-plan attempts
    agg_scale: int = 1
    # allow the unique-build-key join fast path (disabled on re-plan
    # retries: a duplicate-key flag means the hint was wrong)
    unique_join_ok: bool = True
    # lambda-variable bindings while evaluating a HigherOrderFunc body
    lambda_env: Optional[Dict[str, object]] = None

    def record_error(self, flags: jax.Array, message: str) -> None:
        if self.errors is not None:
            if self.row_mask is not None and flags.shape == self.row_mask.shape:
                flags = flags & self.row_mask
            self.errors.append((flags, message))


_DEFAULT_CTX = EvalContext()


# -------------------------------------------------------------------------------------
# dictionary-encoded strings
# -------------------------------------------------------------------------------------
# A dict column's values are a host-side constant (exec/dictionary.py), so:
# - comparisons against literals become int32 code compares (the literal's
#   rank is computed on the host at trace time);
# - any single-input string function evaluates over the K dictionary
#   entries (a K-row mini-batch) and maps back with ONE narrow gather —
#   8M-row byte-matrix compute becomes K-row compute (_eval_on_dict);
# - everything else decodes lazily (_dedict).


def _dedict(cv: ColumnVector) -> ColumnVector:
    return cv.decode() if cv.is_dict else cv


def _eval_on_dict(cv: ColumnVector, fn, ctx: EvalContext) -> ColumnVector:
    """Evaluate ``fn`` (CV of K dictionary rows → CV of K rows) over the
    dictionary, then gather per-row results by code. ANSI error flags raised
    inside ``fn`` are per-entry; they are remapped to the rows that actually
    hold the offending value (live + valid rows only)."""
    d = cv.dictionary
    K = max(d.size, 1)
    small = ColumnVector(
        jnp.asarray(d.values if d.size else np.zeros((1, cv.dtype.byte_width), np.uint8)),
        jnp.ones(K, bool),
        jnp.asarray(d.lengths if d.size else np.zeros(1, np.int32)),
        cv.dtype,
    )
    outer_errors, outer_mask = ctx.errors, ctx.row_mask
    entry_errors: List[Tuple[jax.Array, str]] = []
    ctx.errors = entry_errors if outer_errors is not None else None
    ctx.row_mask = None
    try:
        res = fn(small)
    finally:
        ctx.errors, ctx.row_mask = outer_errors, outer_mask
    idx = jnp.clip(cv.data, 0, K - 1)
    if outer_errors is not None:
        for flags, msg in entry_errors:
            row_flags = jnp.take(flags, idx) & cv.validity
            if outer_mask is not None:
                row_flags = row_flags & outer_mask
            outer_errors.append((row_flags, msg))
    data = jnp.take(res.data, idx, axis=0)
    validity = cv.validity & jnp.take(res.validity, idx)
    lengths = None if res.lengths is None else jnp.take(res.lengths, idx)
    children = tuple(c.take(idx) for c in res.children)
    return ColumnVector(data, validity, lengths, res.dtype, children, res.dictionary)


def _dict_code_compare(op: str, cv: ColumnVector, value, flip: bool) -> ColumnVector:
    """Compare dict codes against a host-encoded literal: the sorted
    dictionary makes every comparison two int compares against trace-time
    rank constants."""
    raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
    d = cv.dictionary
    lp = d.insertion_point(raw, "left")   # #entries < raw
    rp = d.insertion_point(raw, "right")  # #entries <= raw
    codes = cv.data
    eq = (codes >= lp) & (codes < rp)
    if flip:  # literal OP column → mirror the operator
        op = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}.get(op, op)
    data = {
        "eq": eq,
        "ne": ~eq,
        "lt": codes < lp,
        "le": codes < rp,
        "gt": codes >= rp,
        "ge": codes >= lp,
        "eqns": eq,
    }[op]
    if op == "eqns":
        return ColumnVector(data & cv.validity, jnp.ones_like(cv.validity), None, T.BOOL)
    return ColumnVector(data, cv.validity, None, T.BOOL)


def evaluate(e: E.Expr, batch: Batch, ctx: EvalContext = _DEFAULT_CTX) -> ColumnVector:
    """Evaluate a bound expression over a batch, returning a ColumnVector."""
    assert e.dtype is not None, f"expression not bound: {e!r}"
    prev = ctx.row_mask
    ctx.row_mask = batch.row_mask
    try:
        return _ev(e, batch, ctx)
    finally:
        ctx.row_mask = prev


def evaluate_predicate(e: E.Expr, batch: Batch, ctx: EvalContext = _DEFAULT_CTX) -> jax.Array:
    """Evaluate a boolean predicate; SQL filter keeps rows where TRUE
    (null → drop), composed with the batch's live-row mask."""
    cv = evaluate(e, batch, ctx)
    return batch.row_mask & cv.validity & cv.data.astype(bool)


# -------------------------------------------------------------------------------------
# dispatch
# -------------------------------------------------------------------------------------


def _ev(e: E.Expr, b: Batch, ctx: EvalContext) -> ColumnVector:
    if isinstance(e, E.BoundRef):
        return b.columns[e.index]
    if isinstance(e, E.Literal):
        return _literal(e, b.capacity)
    if isinstance(e, E.Alias):
        return _ev(e.child, b, ctx)
    if isinstance(e, E.BinaryOp):
        return _binary(e, b, ctx)
    if isinstance(e, E.UnaryOp):
        return _unary(e, b, ctx)
    if isinstance(e, E.Cast):
        return _cast(_ev(e.child, b, ctx), e.child.dtype, e.to, e.eval_mode, ctx,
                     tz=getattr(e, 'timezone', None))
    if isinstance(e, E.CaseWhen):
        return _case_when(e, b, ctx)
    if isinstance(e, E.InList):
        return _in_list(e, b, ctx)
    if isinstance(e, E.Like):
        return _like(e, b, ctx)
    if isinstance(e, E.StringFunc):
        return _string_func(e, b, ctx)
    if isinstance(e, E.TemporalFunc):
        return _temporal_func(e, b, ctx)
    if isinstance(e, E.MathFunc):
        return _math_func(e, b, ctx)
    if isinstance(e, E.HashFunc):
        return _hash_func(e, b, ctx)
    if isinstance(e, E.LambdaVar):
        assert ctx.lambda_env is not None and e.var_name in ctx.lambda_env, (
            f"lambda variable {e.var_name!r} evaluated outside its lambda")
        return ctx.lambda_env[e.var_name]
    if isinstance(e, E.HigherOrderFunc):
        from datafusion_comet_tpu.exec import nested as NESTED

        return NESTED.ev_hof(e, b, ctx, _ev)
    if isinstance(e, (E.ArrayExpr, E.StructExpr, E.GetStructField, E.MapExpr)):
        from datafusion_comet_tpu.exec import nested as NESTED

        return NESTED.ev_nested(e, b, ctx, _ev)
    if isinstance(e, E.RLike):
        from datafusion_comet_tpu.exec.regex_dfa import compile_dfa, dfa_match

        cv = _ev(e.child, b, ctx)
        trans, accepting = compile_dfa(e.pattern)
        if cv.is_dict:
            def _dfa_small(s, _t=trans, _a=accepting, _neg=e.negated):
                mm = dfa_match(s.data, s.lengths, _t, _a)
                return ColumnVector(~mm if _neg else mm, s.validity, None, T.BOOL)

            return _eval_on_dict(cv, _dfa_small, ctx)
        m = dfa_match(cv.data, cv.lengths, trans, accepting)
        return ColumnVector(~m if e.negated else m, cv.validity, None, T.BOOL)
    if isinstance(e, E.RegexpExtract):
        from datafusion_comet_tpu.exec.regex_extract import (
            extract_device, linearize)

        cv = _ev(e.child, b, ctx)
        lp = linearize(e.pattern, e.group_idx)
        if lp is None:
            raise NotImplementedError(
                f"regexp_extract pattern {e.pattern!r} needs the host bridge")
        if cv.is_dict:
            def _rx_small(s, _lp=lp):
                ob, ol, ov = extract_device(
                    s.data, s.lengths, s.validity, _lp, e.group_idx,
                    e.dtype.byte_width)
                return ColumnVector(ob, ov, ol, e.dtype)

            return _eval_on_dict(cv, _rx_small, ctx)
        ob, ol, ov = extract_device(cv.data, cv.lengths, cv.validity, lp,
                                    e.group_idx, e.dtype.byte_width)
        return ColumnVector(ob, ov, ol, e.dtype)
    if isinstance(e, E.RegexpExtractAll):
        from datafusion_comet_tpu.exec.regex_extract import (
            extract_all_device, linearize, min_match_len)

        cv = _ev(e.child, b, ctx)
        lp = linearize(e.pattern, e.group_idx)
        if lp is None or min_match_len(lp) == 0:
            raise NotImplementedError(
                f"regexp_extract_all pattern {e.pattern!r} needs the host "
                "bridge")
        E_ = e.dtype.max_elems
        w = e.dtype.element.byte_width

        def _rxa_small(s):
            cnt, eb, el, ev2, ovf = extract_all_device(
                s.data, s.lengths, s.validity, lp, e.group_idx, E_, w)
            ctx.record_error(
                ovf, f"regexp_extract_all produced more than "
                f"max_parts={E_} matches")
            elem = ColumnVector(eb, ev2 & s.validity[:, None], el,
                                e.dtype.element)
            return ColumnVector(jnp.where(s.validity, cnt, 0), s.validity,
                                None, e.dtype, (elem,))

        if cv.is_dict:
            return _eval_on_dict(cv, _rxa_small, ctx)
        return _rxa_small(cv)
    if isinstance(e, E.RegexpReplace):
        from datafusion_comet_tpu.exec.regex_extract import (
            linearize, min_match_len, replace_device)

        cv = _ev(e.child, b, ctx)
        lp = linearize(e.pattern, 0)
        if lp is None or min_match_len(lp) == 0:
            raise NotImplementedError(
                f"regexp_replace pattern {e.pattern!r} needs the host bridge")
        repl = e.replacement.encode("utf-8")

        def _rr_small(s):
            ob, ol, ovf = replace_device(s.data, s.lengths, s.validity, lp,
                                         repl, e.dtype.byte_width)
            ctx.record_error(
                ovf, "regexp_replace output exceeded the declared string "
                f"width {e.dtype.byte_width} (pass out_len)")
            return ColumnVector(ob, s.validity, ol, e.dtype)

        if cv.is_dict:
            return _eval_on_dict(cv, _rr_small, ctx)
        return _rr_small(cv)
    if isinstance(e, E.Split):
        from datafusion_comet_tpu.exec.split_device import split_device

        cv = _ev(e.child, b, ctx)
        E_ = e.dtype.max_elems
        w = e.dtype.element.byte_width

        def _split_small(s):
            counts, lv, eb, el, evalid, ovf = split_device(
                s.data, s.lengths, s.validity, e.delim.encode("utf-8"),
                E_, w)
            ctx.record_error(
                ovf, f"split produced more than max_parts={E_} fields "
                "(raise Split.max_parts)")
            elem = ColumnVector(eb, evalid, el, e.dtype.element)
            return ColumnVector(counts, lv, None, e.dtype, (elem,))

        if cv.is_dict:
            return _eval_on_dict(cv, _split_small, ctx)
        return _split_small(cv)
    if isinstance(e, (E.SplitPart, E.SubstringIndex)):
        from datafusion_comet_tpu.exec.split_device import (
            split_part_device, substring_index_device)

        cv = _ev(e.child, b, ctx)
        E_ = e.max_parts or T.DEFAULT_LIST_ELEMS
        w = e.dtype.byte_width
        d = e.delim.encode("utf-8")

        def _sp_small(s):
            if isinstance(e, E.SplitPart):
                ob, ol, ov, ovf, zp = split_part_device(
                    s.data, s.lengths, s.validity, d, e.part, E_, w)
                ctx.record_error(
                    zp & s.validity, "split_part: part must not be 0")
            else:
                ob, ol, ov, ovf = substring_index_device(
                    s.data, s.lengths, s.validity, d, e.count, E_, w)
            ctx.record_error(
                ovf, f"{type(e).__name__}: more than {E_} fields "
                "(raise max_parts)")
            return ColumnVector(ob, ov, ol, e.dtype)

        if cv.is_dict:
            return _eval_on_dict(cv, _sp_small, ctx)
        return _sp_small(cv)
    if isinstance(e, E.FormatNumber):
        from datafusion_comet_tpu.exec.format_number import (format_grouped,
                                                             scale_to_int)

        cv = _ev(e.child, b, ctx)
        d = e.decimals
        w = e.dtype.byte_width
        dt = cv.dtype
        is_nan = is_inf = None
        if dt.is_decimal:
            if cv.data.ndim != 1:
                raise NotImplementedError(
                    "format_number on wide (two-limb) decimals — use "
                    "ir.functions.format_number_host")
            mag, neg, ovf = scale_to_int(cv.data, dt.scale, d)
        elif dt.type_id in ("FLOAT32", "FLOAT64", "DOUBLE", "FLOAT"):
            x = cv.data.astype(jnp.float64) * (10.0 ** d)
            is_nan = jnp.isnan(x)
            is_inf = jnp.isinf(x)
            rx = jnp.round(x)  # HALF_EVEN, the Python round parity
            neg = jnp.signbit(rx) | jnp.signbit(x)
            fin = ~(is_nan | is_inf)
            ovf = fin & (jnp.abs(rx) >= 2.0 ** 62)
            mag = jnp.where(fin & ~ovf, jnp.abs(rx), 0.0).astype(jnp.int64)
        else:  # integers
            mag, neg, ovf = scale_to_int(cv.data, 0, d)
        chars, lens, wide = format_grouped(mag, neg, d, w,
                                           is_nan=is_nan, is_inf=is_inf)
        ctx.record_error(
            (ovf | wide) & cv.validity,
            f"format_number: value does not fit (out_len={w} or scaled "
            "magnitude beyond int64)")
        return ColumnVector(chars, cv.validity, lens, e.dtype)
    if isinstance(e, E.Soundex):
        from datafusion_comet_tpu.exec.split_device import soundex_device

        cv = _ev(e.child, b, ctx)

        def _sx_small(s):
            ob, ol, ov = soundex_device(s.data, s.lengths, s.validity,
                                        e.dtype.byte_width)
            return ColumnVector(ob, ov, ol, e.dtype)

        if cv.is_dict:
            return _eval_on_dict(cv, _sx_small, ctx)
        return _sx_small(cv)
    if isinstance(e, E.PythonUdf):
        from datafusion_comet_tpu.exec.host_udf import eval_python_udf

        return eval_python_udf(e, b, ctx, _ev)
    if isinstance(e, E.BloomMightContain):
        from datafusion_comet_tpu.exec.operators.agg_special import bloom_might_contain

        flt = e.filter
        if isinstance(flt, E.Literal):
            fb = flt.value
        elif isinstance(flt, E.ScalarSubquery):
            assert ctx.subquery_values is not None
            val, ok = ctx.subquery_values[flt.subquery_id]
            fb = val if ok else None
        else:
            raise NotImplementedError("bloom filter must be a literal or scalar subquery")
        if isinstance(fb, str):
            fb = fb.encode("latin-1")
        cv = _ev(e.child, b, ctx)
        return bloom_might_contain(fb, cv)
    if isinstance(e, E.RandExpr):
        from datafusion_comet_tpu.exec.random_xorshift import (
            init_seed_host, rand_column, randn_column)

        s0 = init_seed_host(e.seed, ctx.partition_id
                            if isinstance(ctx.partition_id, int) else 0)
        fn = rand_column if e.func == "rand" else randn_column
        return fn(s0, b.row_mask)
    if isinstance(e, E.MonotonicallyIncreasingId):
        # Spark: partition_id << 33 | row index within partition
        idx = jnp.arange(b.capacity, dtype=jnp.int64) + ctx.batch_row_offset
        data = (jnp.int64(ctx.partition_id) << 33) | idx
        return ColumnVector(data, jnp.ones(b.capacity, bool), None, T.INT64)
    if isinstance(e, E.SparkPartitionId):
        data = jnp.full(b.capacity, ctx.partition_id, jnp.int32)
        return ColumnVector(data, jnp.ones(b.capacity, bool), None, T.INT32)
    if isinstance(e, E.ScalarSubquery):
        assert ctx.subquery_values is not None and e.subquery_id in ctx.subquery_values, (
            f"subquery {e.subquery_id} not materialized"
        )
        value, valid = ctx.subquery_values[e.subquery_id]
        lit = E.Literal(value if valid else None, e.dtype)
        object.__setattr__(lit, "dtype", e.dtype)
        return _literal(lit, b.capacity)
    raise NotImplementedError(f"evaluate: {type(e).__name__}")


# -------------------------------------------------------------------------------------
# literals
# -------------------------------------------------------------------------------------


def _literal(e: E.Literal, cap: int) -> ColumnVector:
    dt = e.dtype
    if e.value is None:
        if dt.is_binary:
            return ColumnVector(
                jnp.zeros((cap, dt.byte_width), jnp.uint8),
                jnp.zeros(cap, bool),
                jnp.zeros(cap, jnp.int32),
                dt,
            )
        phys = dt.np_dtype() if dt.type_id != "NULL" else np.int8
        shape = (cap, 2) if dt.is_decimal and dt.is_wide_decimal else cap
        return ColumnVector(jnp.zeros(shape, phys), jnp.zeros(cap, bool), None, dt)
    if dt.is_binary:
        raw = e.value.encode("utf-8") if isinstance(e.value, str) else bytes(e.value)
        w = dt.byte_width
        mat = np.zeros((cap, w), np.uint8)
        mat[:, : len(raw)] = np.frombuffer(raw, np.uint8)
        return ColumnVector(
            jnp.asarray(mat),
            jnp.ones(cap, bool),
            jnp.full(cap, len(raw), jnp.int32),
            dt,
        )
    if dt.is_decimal and dt.is_wide_decimal:
        v = int(e.value)
        if abs(v) < _NARROW_LIMIT:
            return ColumnVector(
                jnp.full(cap, np.int64(v)), jnp.ones(cap, bool), None, dt,
                mag_bound=quantize_bound(abs(v)),
            )
        from datafusion_comet_tpu.exec import decimal_wide as DW

        limbs = DW.pack_np_int([v], 1)[0]
        data = jnp.broadcast_to(jnp.asarray(limbs), (cap, 2))
        return ColumnVector(data, jnp.ones(cap, bool), None, dt)
    phys = dt.np_dtype()
    data = jnp.full(cap, np.asarray(e.value).astype(phys))
    bound = None
    if dt.is_decimal or dt.is_integer:
        bound = quantize_bound(abs(int(e.value)))
    return ColumnVector(data, jnp.ones(cap, bool), None, dt, mag_bound=bound)


# -------------------------------------------------------------------------------------
# decimal helpers
# -------------------------------------------------------------------------------------


def _rescale_up_i64(data: jax.Array, k: int) -> jax.Array:
    if k == 0:
        return data
    return data * np.int64(10**k)


def _decimal_to_common(cv: ColumnVector, target: T.DataType) -> jax.Array:
    """Rescale a decimal column's scaled-i64 data to target scale (up only)."""
    k = target.scale - cv.dtype.scale
    assert k >= 0
    return _rescale_up_i64(cv.data, k)


def _decimal_downscale_half_up_i64(data: jax.Array, k: int) -> jax.Array:
    """Divide by 10^k with HALF_UP rounding (i64 path)."""
    if k == 0:
        return data
    d = np.int64(10**k)
    q = data // d
    r = data - q * d
    # floor-division remainder has sign of divisor (positive); adjust to trunc
    negative = data < 0
    q_trunc = jnp.where(negative & (r != 0), q + 1, q)
    r_trunc = jnp.where(negative & (r != 0), r - d, r)
    round_away = (jnp.abs(r_trunc) * 2) >= d
    return q_trunc + jnp.where(round_away, jnp.where(negative, -1, 1), 0)


# -------------------------------------------------------------------------------------
# coercion
# -------------------------------------------------------------------------------------


def _coerce(cv: ColumnVector, to: T.DataType, ctx: EvalContext, mode: str = E.EvalMode.LEGACY) -> ColumnVector:
    if cv.dtype == to:
        return cv
    return _cast(cv, cv.dtype, to, mode, ctx)


# -------------------------------------------------------------------------------------
# binary ops
# -------------------------------------------------------------------------------------


def _binary(e: E.BinaryOp, b: Batch, ctx: EvalContext) -> ColumnVector:
    op = e.op
    if op in ("and", "or"):
        return _kleene(op, _ev(e.left, b, ctx), _ev(e.right, b, ctx))
    if op in ("eq", "ne", "lt", "le", "gt", "ge", "eqns"):
        # dict fast path: codes vs a trace-time literal rank
        l = r = None
        if (
            isinstance(e.right, E.Literal)
            and e.right.dtype is not None and e.right.dtype.is_binary
            and e.right.value is not None
        ):
            l = _ev(e.left, b, ctx)
            if l.is_dict:
                return _dict_code_compare(op, l, e.right.value, flip=False)
        elif (
            isinstance(e.left, E.Literal)
            and e.left.dtype is not None and e.left.dtype.is_binary
            and e.left.value is not None
        ):
            r = _ev(e.right, b, ctx)
            if r.is_dict:
                return _dict_code_compare(op, r, e.left.value, flip=True)
        l = l if l is not None else _ev(e.left, b, ctx)
        r = r if r is not None else _ev(e.right, b, ctx)
        return _compare(op, l, r, ctx)
    l = _ev(e.left, b, ctx)
    r = _ev(e.right, b, ctx)
    if op in ("add", "sub", "mul", "div", "mod", "pmod"):
        return _arith(e, l, r, ctx)
    if op in ("band", "bor", "bxor", "shiftleft", "shiftright"):
        ct = e.dtype
        ld = _coerce(l, ct, ctx).data
        rd = r.data if op in ("shiftleft", "shiftright") else _coerce(r, ct, ctx).data
        fn = {
            "band": jnp.bitwise_and,
            "bor": jnp.bitwise_or,
            "bxor": jnp.bitwise_xor,
            "shiftleft": lambda a, s: a << (s.astype(a.dtype) & (a.dtype.itemsize * 8 - 1)),
            "shiftright": lambda a, s: a >> (s.astype(a.dtype) & (a.dtype.itemsize * 8 - 1)),
        }[op]
        return ColumnVector(fn(ld, rd), l.validity & r.validity, None, ct)
    raise NotImplementedError(op)


def _kleene(op: str, l: ColumnVector, r: ColumnVector) -> ColumnVector:
    ld = l.data.astype(bool)
    rd = r.data.astype(bool)
    lv, rv = l.validity, r.validity
    if op == "and":
        data = (ld | ~lv) & (rd | ~rv)  # null treated as True; falseness dominates
        validity = (lv & rv) | (lv & ~ld) | (rv & ~rd)
    else:
        data = (ld & lv) | (rd & rv)  # null treated as False; trueness dominates
        validity = (lv & rv) | (lv & ld) | (rv & rd)
    return ColumnVector(data, validity, None, T.BOOL)


def _float_eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return (a == b) | (jnp.isnan(a) & jnp.isnan(b))


def _float_lt(a: jax.Array, b: jax.Array) -> jax.Array:
    # Spark ordering: NaN is greater than everything, NaN == NaN
    return jnp.where(jnp.isnan(a), False, jnp.where(jnp.isnan(b), True, a < b))


def _string_eq(l: ColumnVector, r: ColumnVector) -> jax.Array:
    w = max(l.data.shape[1], r.data.shape[1])
    ld = _pad_width(l.data, w)
    rd = _pad_width(r.data, w)
    return jnp.all(ld == rd, axis=1) & (l.lengths == r.lengths)


def _pad_width(mat: jax.Array, w: int) -> jax.Array:
    if mat.shape[1] == w:
        return mat
    return jnp.pad(mat, ((0, 0), (0, w - mat.shape[1])))


def _string_lt(l: ColumnVector, r: ColumnVector) -> jax.Array:
    w = max(l.data.shape[1], r.data.shape[1])
    ld = _pad_width(l.data, w).astype(jnp.int32)
    rd = _pad_width(r.data, w).astype(jnp.int32)
    diff = ld != rd
    any_diff = jnp.any(diff, axis=1)
    first = jnp.argmax(diff, axis=1)
    lb = jnp.take_along_axis(ld, first[:, None], axis=1)[:, 0]
    rb = jnp.take_along_axis(rd, first[:, None], axis=1)[:, 0]
    # zero padding encodes the shorter-string-is-smaller rule
    return jnp.where(any_diff, lb < rb, l.lengths < r.lengths)


def _compare(op: str, l: ColumnVector, r: ColumnVector, ctx: EvalContext) -> ColumnVector:
    if l.is_dict or r.is_dict:
        if l.is_dict and r.is_dict and l.dictionary == r.dictionary:
            # same sorted dictionary → code order == string order
            eq = l.data == r.data
            lt = l.data < r.data
            return _compare_result(op, eq, lt, l, r)
        l, r = _dedict(l), _dedict(r)
    lt_, rt_ = l.dtype, r.dtype
    if lt_.is_binary or rt_.is_binary:
        eq = _string_eq(l, r)
        lt = _string_lt(l, r)
    elif lt_.is_decimal or rt_.is_decimal:
        ct = T.common_type(
            lt_ if lt_.is_decimal else _int_as_decimal(lt_),
            rt_ if rt_.is_decimal else _int_as_decimal(rt_),
        )
        lk = ct.scale - (lt_.scale if lt_.is_decimal else 0)
        rk = ct.scale - (rt_.scale if rt_.is_decimal else 0)
        ldt = lt_ if lt_.is_decimal else _int_as_decimal(lt_)
        rdt = rt_ if rt_.is_decimal else _int_as_decimal(rt_)
        if (
            l.is_wide_storage
            or r.is_wide_storage
            or _dec_bound(l, ldt) * 10**lk >= _NARROW_LIMIT
            or _dec_bound(r, rdt) * 10**rk >= _NARROW_LIMIT
        ):
            from datafusion_comet_tpu.exec import decimal_wide as DW

            eq, lt = DW.compare(DW.lift(l, lk), DW.lift(r, rk))
            return _compare_result(op, eq, lt, l, r)
        # bounds prove the upscale to the common scale fits int64
        ld = _decimal_compare_data(l, ct)
        rd = _decimal_compare_data(r, ct)
        eq = ld == rd
        lt = ld < rd
    elif lt_.is_floating or rt_.is_floating:
        ct = T.common_type(lt_, rt_)
        ld = _coerce(l, ct, ctx).data
        rd = _coerce(r, ct, ctx).data
        eq = _float_eq(ld, rd)
        lt = _float_lt(ld, rd)
    else:
        ct = T.common_type(lt_, rt_)
        ld = _coerce(l, ct, ctx).data
        rd = _coerce(r, ct, ctx).data
        eq = ld == rd
        lt = ld < rd
    return _compare_result(op, eq, lt, l, r)


def _compare_result(op: str, eq: jax.Array, lt: jax.Array, l: ColumnVector, r: ColumnVector) -> ColumnVector:
    both = l.validity & r.validity
    if op == "eqns":
        data = jnp.where(both, eq, l.validity == r.validity)
        return ColumnVector(data, jnp.ones_like(both), None, T.BOOL)
    data = {
        "eq": eq,
        "ne": ~eq,
        "lt": lt,
        "le": lt | eq,
        "gt": ~(lt | eq),
        "ge": ~lt,
    }[op]
    return ColumnVector(data, both, None, T.BOOL)


def _int_as_decimal(t: T.DataType) -> T.DataType:
    return {
        "INT8": T.decimal(3, 0),
        "INT16": T.decimal(5, 0),
        "INT32": T.decimal(10, 0),
        "INT64": T.decimal(20, 0),
    }[t.type_id]


# Narrow-storage threshold: a decimal column stays 1-D int64 while its sound
# magnitude bound is below this (margin under 2^63 so one add can't wrap).
_NARROW_LIMIT = 1 << 62


def _dec_bound(cv: ColumnVector, dt: T.DataType) -> int:
    """Sound upper bound on max |unscaled value| of ``cv`` viewed as ``dt``.
    Uses the tracked per-batch bound when present, else the type bound."""
    if cv.mag_bound is not None:
        return cv.mag_bound
    if cv.dtype.is_integer or cv.dtype.is_boolean:
        return min(10**dt.precision - 1, 1 << 63)
    if cv.dtype.is_decimal and not cv.is_wide_storage and cv.dtype.precision > 18:
        # narrow-stored wide-typed column without a recorded bound: storage
        # itself proves the values fit int64
        return (1 << 63) - 1
    return 10**dt.precision - 1


def _with_bound(cv: ColumnVector, bound: int) -> ColumnVector:
    return ColumnVector(cv.data, cv.validity, cv.lengths, cv.dtype,
                        cv.children, cv.dictionary, quantize_bound(bound))


def _decimal_compare_data(cv: ColumnVector, ct: T.DataType) -> jax.Array:
    src_scale = cv.dtype.scale if cv.dtype.is_decimal else 0
    data = cv.data.astype(jnp.int64)
    k = ct.scale - src_scale
    return _rescale_up_i64(data, k)


def _arith(e: E.BinaryOp, l: ColumnVector, r: ColumnVector, ctx: EvalContext) -> ColumnVector:
    op, out = e.op, e.dtype
    validity = l.validity & r.validity
    if out.is_decimal:
        return _decimal_arith(e, l, r, validity, ctx)
    ld = _coerce(l, out if op != "div" else T.FLOAT64, ctx).data
    rd = _coerce(r, out if op != "div" else T.FLOAT64, ctx).data
    if op == "add":
        data = ld + rd
    elif op == "sub":
        data = ld - rd
    elif op == "mul":
        data = ld * rd
    elif op == "div":
        if out.is_floating:
            safe = jnp.where(rd == 0, jnp.ones_like(rd), rd)
            raw = ld / safe
            zero_div = (rd == 0) & validity
            # Spark float division by zero yields null? No: Java semantics ±Inf/NaN
            data = jnp.where(rd == 0, ld / jnp.zeros_like(rd), raw)
        else:
            raise AssertionError("non-float div should be decimal or promoted")
    elif op in ("mod", "pmod"):
        is_zero = rd == 0
        safe = jnp.where(is_zero, jnp.ones_like(rd), rd)
        if out.is_floating:
            data = jnp.where(is_zero, jnp.full_like(ld, np.nan), _c_fmod(ld, safe))
        else:
            m = _c_mod_int(ld, safe)
            if op == "pmod":
                m = jnp.where(m < 0, m + jnp.abs(safe), m)
            data = m
            if e.eval_mode == E.EvalMode.ANSI:
                ctx.record_error(is_zero & validity, "DIVIDE_BY_ZERO")
            validity = validity & ~is_zero
    else:
        raise NotImplementedError(op)
    return ColumnVector(data, validity, None, out)


def _c_fmod(a, b):
    return a - b * jnp.trunc(a / b)


def _c_mod_int(a, b):
    q = jnp.where(jnp.sign(a) == jnp.sign(b), a // b, -((-a) // b) if False else a // b)
    # jnp // is floor; C/Java % truncates toward zero
    qt = jnp.trunc(a.astype(jnp.float64) / b.astype(jnp.float64)).astype(a.dtype)
    return a - qt * b


def _arith_bound(op: str, lb: int, rb: int, s1: int, s2: int, so: int, prec: int):
    """(sound output |unscaled| bound, narrow-path-is-exact) for a decimal
    binary op with input bounds lb/rb at scales s1/s2, output scale so and
    output precision prec."""
    if op in ("add", "sub"):
        if so < s1 or so < s2:
            return 10**38, False
        ob = lb * 10 ** (so - s1) + rb * 10 ** (so - s2)
        return ob, ob < _NARROW_LIMIT
    if op == "mul":
        raw_scale = s1 + s2
        raw = lb * rb
        if so >= raw_scale:
            ob = raw * 10 ** (so - raw_scale)
        else:
            ob = raw // 10 ** (raw_scale - so) + 1
        # interior i128 product is exact while |l|,|r| fit i64 (narrow
        # storage guarantees it) and the downscale divisor fits i64
        safe = ob < _NARROW_LIMIT and (so >= raw_scale or raw_scale - so <= 18)
        return ob, safe
    if op == "div":
        k = so - s1 + s2
        if k < 0:
            return 10**38, False
        nb = lb * 10**k  # |quotient| <= |scaled numerator| since |den| >= 1
        # i64 tier when everything fits; i128 tier (with per-row overflow
        # nulling vs 10^prec) when the numerator fits i128 and legal results
        # fit i64; otherwise the wide path
        ob = min(nb + 1, 10**prec - 1)
        safe = nb + 1 < _NARROW_LIMIT or (nb < 2**126 and ob < _NARROW_LIMIT)
        return ob, safe
    if op in ("mod", "pmod"):
        s = max(s1, s2)
        ab, cb = lb * 10 ** (s - s1), rb * 10 ** (s - s2)
        mb = cb if op == "pmod" else min(ab, cb)
        ob = mb * 10 ** (so - s) if so >= s else mb // 10 ** (s - so) + 1
        return ob, ab < _NARROW_LIMIT and cb < _NARROW_LIMIT
    return 10**38, False


def _decimal_arith(e: E.BinaryOp, l: ColumnVector, r: ColumnVector, validity, ctx) -> ColumnVector:
    op, out = e.op, e.dtype
    lt_ = l.dtype if l.dtype.is_decimal else _int_as_decimal(l.dtype)
    rt_ = r.dtype if r.dtype.is_decimal else _int_as_decimal(r.dtype)
    s1, s2, so = lt_.scale, rt_.scale, out.scale
    lb, rb = _dec_bound(l, lt_), _dec_bound(r, rt_)
    ob, narrow_ok = _arith_bound(op, lb, rb, s1, s2, so, out.precision)
    if l.is_wide_storage or r.is_wide_storage or not narrow_ok:
        from datafusion_comet_tpu.exec import decimal_wide as DW

        res, zero_div = DW.arith(op, l, r, lt_, rt_, out)
        if op in ("div", "mod", "pmod"):
            if e.eval_mode == E.EvalMode.ANSI:
                ctx.record_error(zero_div & validity, "DIVIDE_BY_ZERO")
            validity = validity & ~zero_div
        over = DW.overflow_check(res, out.precision)
        if e.eval_mode == E.EvalMode.ANSI:
            ctx.record_error(over & validity, "NUMERIC_VALUE_OUT_OF_RANGE")
        validity = validity & ~over  # LEGACY/TRY: overflow -> null
        eff = min(ob, 10**out.precision - 1)  # overflow rows are null
        if out.is_wide_decimal and eff >= _NARROW_LIMIT:
            return ColumnVector(DW.pack(res), validity, None, out)
        return _with_bound(ColumnVector(res[1], validity, None, out), eff)
    ld = l.data.astype(jnp.int64)
    rd = r.data.astype(jnp.int64)
    s1, s2, so = lt_.scale, rt_.scale, out.scale
    if op in ("add", "sub"):
        a = _rescale_up_i64(ld, so - s1)
        c = _rescale_up_i64(rd, so - s2)
        data = a + c if op == "add" else a - c
    elif op == "mul":
        raw_scale = s1 + s2
        if lb * rb < _NARROW_LIMIT and raw_scale >= so:
            # bounds prove the RAW product fits int64: plain multiply +
            # int64 HALF_UP rescale — skips the emulated i128 partial
            # products entirely (the Q1 disc_price/charge hot path)
            raw = ld * rd
            data = raw if raw_scale == so else _decimal_downscale_half_up_i64(raw, raw_scale - so)
        else:
            prod = int128.mul_i64(ld, rd)
            if raw_scale == so:
                data = int128.to_i64(prod)
            else:
                data = int128.div_i128_i64_half_up(prod, jnp.asarray(np.int64(10 ** (raw_scale - so))))
    elif op in ("div",):
        k = so - s1 + s2
        is_zero = rd == 0
        safe = jnp.where(is_zero, jnp.ones_like(rd), rd)
        if lb * 10**k + 1 < _NARROW_LIMIT:
            num = _rescale_up_i64(ld, k)
            data = _div_i64_half_up(num, safe)
        else:
            # numerator needs i128; null rows whose quotient overflows the
            # output precision (Spark LEGACY nulls / ANSI errors on overflow)
            from datafusion_comet_tpu.exec import decimal_wide as DW

            num = int128.mul_pow10_i64(ld, k)
            q = DW._div_i128_i64_full(num, safe)
            lim = np.int64(10 ** min(out.precision, 18) - 1)
            over = ~DW.fits_i64(q) | (jnp.abs(q[1]) > lim)
            if e.eval_mode == E.EvalMode.ANSI:
                ctx.record_error(over & validity & ~is_zero, "NUMERIC_VALUE_OUT_OF_RANGE")
            validity = validity & ~over
            data = q[1]
        if e.eval_mode == E.EvalMode.ANSI:
            ctx.record_error(is_zero & validity, "DIVIDE_BY_ZERO")
        validity = validity & ~is_zero
    elif op in ("mod", "pmod"):
        s = max(s1, s2)
        a = _rescale_up_i64(ld, s - s1)
        c = _rescale_up_i64(rd, s - s2)
        is_zero = c == 0
        safe = jnp.where(is_zero, jnp.ones_like(c), c)
        m = _c_mod_int(a, safe)
        if op == "pmod":
            m = jnp.where(m < 0, m + jnp.abs(safe), m)
        data = _rescale_up_i64(m, so - s) if so >= s else _decimal_downscale_half_up_i64(m, s - so)
        validity = validity & ~is_zero
    else:
        raise NotImplementedError(op)
    return _with_bound(ColumnVector(data, validity, None, out), ob)


def _div_i64_half_up(num: jax.Array, den: jax.Array) -> jax.Array:
    q = num // den
    r = num - q * den
    # convert floor to trunc
    adjust = (r != 0) & ((num < 0) != (den < 0))
    q_t = jnp.where(adjust, q + 1, q)
    r_t = jnp.where(adjust, r - den, r)
    round_away = (jnp.abs(r_t) * 2) >= jnp.abs(den)
    sign = jnp.where((num < 0) != (den < 0), -1, 1)
    return q_t + jnp.where(round_away & (r_t != 0), sign, 0)


# -------------------------------------------------------------------------------------
# unary
# -------------------------------------------------------------------------------------


def _unary(e: E.UnaryOp, b: Batch, ctx: EvalContext) -> ColumnVector:
    c = _ev(e.child, b, ctx)
    if e.op == "isnull":
        return ColumnVector(~c.validity, jnp.ones_like(c.validity), None, T.BOOL)
    if e.op == "isnotnull":
        return ColumnVector(c.validity, jnp.ones_like(c.validity), None, T.BOOL)
    if e.op == "not":
        return ColumnVector(~c.data.astype(bool), c.validity, None, T.BOOL)
    if e.op == "isnan":
        d = jnp.isnan(c.data) if c.dtype.is_floating else jnp.zeros(c.capacity, bool)
        return ColumnVector(d & c.validity, jnp.ones_like(c.validity), None, T.BOOL)
    if e.op in ("negate", "abs"):
        if c.is_wide_storage:
            from datafusion_comet_tpu.exec import decimal_wide as DW
            from datafusion_comet_tpu.utils import int128

            p = DW.pair(c.data)
            res = int128.neg(p) if e.op == "negate" else int128.abs_(p)
            return ColumnVector(DW.pack(res), c.validity, None, c.dtype)
        data = -c.data if e.op == "negate" else jnp.abs(c.data)
        return ColumnVector(data, c.validity, None, c.dtype, mag_bound=c.mag_bound)
    raise NotImplementedError(e.op)


# -------------------------------------------------------------------------------------
# cast
# -------------------------------------------------------------------------------------


def _cast(cv: ColumnVector, frm: T.DataType, to: T.DataType, mode: str, ctx: EvalContext,
          tz: Optional[str] = None) -> ColumnVector:
    """Numeric/temporal/string cast subset of the Spark cast matrix
    (reference: spark-expr/src/conversion_funcs/cast.rs — 1,282 LoC full
    matrix; CometCast.scala:175 support levels)."""
    if frm == to:
        return cv
    if cv.is_dict:
        # parse/format the K dictionary entries, map back by code
        return _eval_on_dict(cv, lambda s: _cast(s, frm, to, mode, ctx, tz), ctx)
    if frm.type_id == "NULL":
        lit = E.Literal(None, to)
        object.__setattr__(lit, "dtype", to)
        return _literal(lit, cv.capacity)
    validity = cv.validity
    if to.is_binary:
        if frm.is_binary:
            w = to.byte_width
            data = cv.data[:, :w] if cv.data.shape[1] >= w else _pad_width(cv.data, w)
            return ColumnVector(data, validity, jnp.minimum(cv.lengths, w), to)
        if frm.is_integer or frm.is_decimal or frm.type_id == "DATE" or frm.is_boolean:
            return _cast_to_string(cv, frm, to)
        if frm.is_floating:
            # Java shortest-repr (Ryu) on device (reference: cast.rs
            # float-to-string; known deviation: XLA DAZ flushes subnormals
            # to "0.0" — docs/compatibility.md)
            from datafusion_comet_tpu.exec import ryu

            w = to.byte_width
            if frm == T.FLOAT32:
                chars, lens = ryu.float_to_string(cv.data, w)
            else:
                chars, lens = ryu.double_to_string(cv.data, w)
            return ColumnVector(chars, validity, lens, to)
        if frm.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ"):
            if tz and frm.type_id == "TIMESTAMP":
                # session-tz rendering: shift the instant to wall clock
                # (reference: cast.rs timestamp formatter w/ timezone)
                micros = cv.data.astype(jnp.int64)
                local = micros + _tz_offset_micros(micros, tz, local=False)
                cv = ColumnVector(local, cv.validity, None, frm)
            return _timestamp_to_string(cv, to)
        raise NotImplementedError(f"cast {frm!r} -> string")
    if frm.is_binary:
        return _cast_string_to(cv, frm, to, mode, ctx, tz)
    if to.is_decimal:
        nb = _cast_bound(cv, frm, to)
        if cv.is_wide_storage or nb is None or nb >= _NARROW_LIMIT:
            return _cast_wide_decimal(cv, frm, to, mode, ctx, validity)
        if frm.is_decimal:
            k = to.scale - frm.scale
            if k >= 0:
                data = _rescale_up_i64(cv.data.astype(jnp.int64), k)
            else:
                data = _decimal_downscale_half_up_i64(cv.data.astype(jnp.int64), -k)
            return _with_bound(ColumnVector(data, validity, None, to), nb)
        if frm.is_integer or frm.is_boolean:
            data = cv.data.astype(jnp.int64) * np.int64(10**to.scale)
            return _with_bound(ColumnVector(data, validity, None, to), nb)
        if frm.is_floating:
            scaled = cv.data.astype(jnp.float64) * (10.0**to.scale)
            ok = jnp.isfinite(scaled)
            data = jnp.where(ok, jnp.round(scaled), 0).astype(jnp.int64)
            if mode == E.EvalMode.ANSI:
                ctx.record_error(~ok & validity, "CAST_OVERFLOW")
            return ColumnVector(data, validity & ok, None, to)
        raise NotImplementedError(f"cast {frm!r} -> {to!r}")
    if frm.is_decimal:
        from datafusion_comet_tpu.exec import decimal_wide as DW

        if to.is_integer:
            if cv.is_wide_storage:
                p = DW.rescale_trunc(DW.pair(cv.data), -frm.scale)
                fits = DW.fits_i64(p)
                if mode == E.EvalMode.ANSI:
                    ctx.record_error(~fits & validity, "CAST_OVERFLOW")
                return _int_narrow(p[1], validity & fits, to, mode, ctx)
            scaled = _decimal_truncate_i64(cv.data.astype(jnp.int64), frm.scale)
            return _int_narrow(scaled, validity, to, mode, ctx)
        if to.is_floating:
            if cv.is_wide_storage:
                data = DW.to_f64(cv.data, frm.scale)
            else:
                data = cv.data.astype(jnp.float64) / (10.0**frm.scale)
            return ColumnVector(data.astype(to.np_dtype()), validity, None, to)
        raise NotImplementedError(f"cast decimal -> {to!r}")
    if frm.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ") and (
            to.is_integer or to.is_floating):
        # Spark: timestamp -> numeric is SECONDS since epoch (floored for
        # integers, fractional for floats — cast.rs timestamp-to-numeric)
        micros = cv.data.astype(jnp.int64)
        if to.is_integer:
            sec = jnp.floor_divide(micros, np.int64(1_000_000))
            return _int_narrow(sec, validity, to, mode, ctx)
        return ColumnVector((micros.astype(jnp.float64) / 1e6).astype(to.np_dtype()),
                            validity, None, to)
    if to.is_integer:
        if frm.is_floating:
            lo, hi = to.int_bounds()
            trunc = jnp.trunc(cv.data)
            in_range = (trunc >= lo) & (trunc <= hi) & ~jnp.isnan(cv.data)
            data = jnp.where(in_range, trunc, 0).astype(to.np_dtype())
            if mode == E.EvalMode.ANSI:
                ctx.record_error(~in_range & validity, "CAST_OVERFLOW")
                return ColumnVector(data, validity, None, to)
            if mode == E.EvalMode.TRY:
                return ColumnVector(data, validity & in_range, None, to)
            # LEGACY: Java narrowing (wraps); emulate via int64 then truncate bits
            wrapped = jnp.where(jnp.isnan(cv.data), 0, jnp.clip(cv.data, -(2.0**63), 2.0**63 - 1)).astype(jnp.int64)
            return ColumnVector(wrapped.astype(to.np_dtype()), validity, None, to)
        return _int_narrow(cv.data.astype(jnp.int64), validity, to, mode, ctx)
    if to.is_floating:
        return ColumnVector(cv.data.astype(to.np_dtype()), validity, None, to)
    if to.is_boolean:
        return ColumnVector(cv.data != 0, validity, None, to)
    if to.type_id == "DATE" and frm.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ"):
        micros = cv.data.astype(jnp.int64)
        if tz and frm.type_id == "TIMESTAMP":
            micros = micros + _tz_offset_micros(micros, tz, local=False)
        days = jnp.floor_divide(micros, np.int64(86_400_000_000))
        return ColumnVector(days.astype(jnp.int32), validity, None, to)
    if to.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ") and frm.type_id == "DATE":
        micros = cv.data.astype(jnp.int64) * np.int64(86_400_000_000)
        if tz and to.type_id == "TIMESTAMP":
            # local midnight -> instant (DST gaps resolve to the pre-gap
            # offset; docs/compatibility.md)
            micros = micros - _tz_offset_micros(micros, tz, local=True)
        return ColumnVector(micros, validity, None, to)
    if to.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ") and (
            frm.is_integer or frm.is_floating or frm.is_boolean):
        # Spark: numeric = SECONDS since epoch (fraction kept to micros);
        # NaN/Inf → null (cast.rs numeric-to-timestamp)
        if frm.is_floating:
            sec = cv.data.astype(jnp.float64)
            ok = jnp.isfinite(sec) & (jnp.abs(sec) < 9.3e12)  # micros fit i64
            micros = jnp.where(ok, sec * 1e6, 0.0).astype(jnp.int64)
            return ColumnVector(micros, validity & ok, None, to)
        micros = cv.data.astype(jnp.int64) * np.int64(1_000_000)
        return ColumnVector(micros, validity, None, to)
    raise NotImplementedError(f"cast {frm!r} -> {to!r}")


def _cast_bound(cv: ColumnVector, frm: T.DataType, to: T.DataType):
    """Sound |unscaled| bound of cast(cv as to) computed on the host, or
    None when unbounded (floats) — None routes to the wide i128 path."""
    if frm.is_decimal:
        fb = _dec_bound(cv, frm)
        k = to.scale - frm.scale
        return fb * 10**k if k >= 0 else fb // 10 ** (-k) + 1
    if frm.is_integer or frm.is_boolean:
        lo, hi = (0, 1) if frm.is_boolean else frm.int_bounds()
        return max(abs(int(lo)), int(hi)) * 10**to.scale
    return None


def _cast_wide_decimal(cv: ColumnVector, frm: T.DataType, to: T.DataType, mode: str, ctx: EvalContext, validity) -> ColumnVector:
    """Casts to/from decimals needing i128: rescale + precision-overflow
    check (cast.rs decimal matrix rows; Spark nulls on overflow in
    LEGACY/TRY, errors in ANSI). Output storage narrows back to 1-D int64
    when the post-check bound fits (overflowed rows are null)."""
    from datafusion_comet_tpu.exec import decimal_wide as DW
    from datafusion_comet_tpu.utils import int128 as i128

    if frm.is_decimal:
        p = DW.rescale(DW.lift(cv), to.scale - frm.scale)
    elif frm.is_integer or frm.is_boolean:
        p = i128.mul_pow10_i128(i128.from_i64(cv.data.astype(jnp.int64)), to.scale)
    elif frm.is_floating:
        scaled = cv.data.astype(jnp.float64) * (10.0**to.scale)
        ok = jnp.isfinite(scaled)
        p = DW._f64_to_i128(jnp.where(ok, jnp.round(scaled), 0.0))
        if mode == E.EvalMode.ANSI:
            ctx.record_error(~ok & validity, "CAST_OVERFLOW")
        validity = validity & ok
    else:
        raise NotImplementedError(f"cast {frm!r} -> {to!r}")
    over = DW.overflow_check(p, to.precision)
    if mode == E.EvalMode.ANSI:
        ctx.record_error(over & validity, "CAST_OVERFLOW")
    validity = validity & ~over
    nb = _cast_bound(cv, frm, to)
    eff = min(nb, 10**to.precision - 1) if nb is not None else 10**to.precision - 1
    if to.is_wide_decimal and eff >= _NARROW_LIMIT:
        return ColumnVector(DW.pack(p), validity, None, to)
    # post-check values fit the low limb (overflow rows are already null)
    return _with_bound(ColumnVector(p[1], validity, None, to), eff)


def _decimal_truncate_i64(data: jax.Array, scale: int) -> jax.Array:
    if scale == 0:
        return data
    d = np.int64(10**scale)
    q = data // d
    r = data - q * d
    return jnp.where((data < 0) & (r != 0), q + 1, q)


def _int_narrow(data_i64: jax.Array, validity, to: T.DataType, mode: str, ctx) -> ColumnVector:
    lo, hi = to.int_bounds()
    in_range = (data_i64 >= lo) & (data_i64 <= hi)
    out = data_i64.astype(to.np_dtype())  # wraps like Java narrowing
    if mode == E.EvalMode.ANSI:
        ctx.record_error(~in_range & validity, "CAST_OVERFLOW")
        return ColumnVector(out, validity, None, to)
    if mode == E.EvalMode.TRY:
        return ColumnVector(out, validity & in_range, None, to)
    return ColumnVector(out, validity, None, to)


_DIGIT0 = ord("0")


def _cast_to_string(cv: ColumnVector, frm: T.DataType, to: T.DataType) -> ColumnVector:
    """int/decimal/date/bool → padded-byte string, fully vectorized."""
    cap = cv.capacity
    w = to.byte_width
    if frm.is_boolean:
        tmat = np.zeros((2, w), np.uint8)
        tmat[1, :4] = np.frombuffer(b"true", np.uint8)
        tmat[0, :5] = np.frombuffer(b"false", np.uint8)
        lens = jnp.where(cv.data.astype(bool), 4, 5).astype(jnp.int32)
        data = jnp.asarray(tmat)[cv.data.astype(jnp.int32)]
        return ColumnVector(data, cv.validity, lens, to)
    if frm.type_id == "DATE":
        y, m, d = _civil_from_days(cv.data.astype(jnp.int64))
        digits = jnp.stack(
            [
                y // 1000 % 10,
                y // 100 % 10,
                y // 10 % 10,
                y % 10,
                jnp.full_like(y, -(_DIGIT0 - ord("-"))),  # placeholder, fixed below
            ],
            axis=1,
        )
        # build "yyyy-mm-dd"
        chars = jnp.zeros((cap, w), jnp.int32)
        cols = [
            y // 1000 % 10 + _DIGIT0,
            y // 100 % 10 + _DIGIT0,
            y // 10 % 10 + _DIGIT0,
            y % 10 + _DIGIT0,
            jnp.full_like(y, ord("-")),
            m // 10 % 10 + _DIGIT0,
            m % 10 + _DIGIT0,
            jnp.full_like(y, ord("-")),
            d // 10 % 10 + _DIGIT0,
            d % 10 + _DIGIT0,
        ]
        for i, c in enumerate(cols):
            chars = chars.at[:, i].set(c.astype(jnp.int32))
        return ColumnVector(chars.astype(jnp.uint8), cv.validity, jnp.full(cap, 10, jnp.int32), to)
    # integers / decimals
    scale = frm.scale if frm.is_decimal else 0
    if frm.is_decimal and cv.is_wide_storage:
        from datafusion_comet_tpu.exec import decimal_wide as DW

        digs, negative = DW.digits_39(DW.pair(cv.data))
        digs = digs.astype(jnp.int64)
        MAXD = digs.shape[1]
        u = jnp.max(digs, axis=1)  # only zero/nonzero matters below
    else:
        v = cv.data.astype(jnp.int64)
        negative = v < 0
        u = jnp.where(negative, -v, v)
        MAXD = 19
        # digits little-endian
        digs = []
        x = u
        for _ in range(MAXD):
            digs.append(x % 10)
            x = x // 10
        digs = jnp.stack(digs, axis=1)  # (cap, 19) little-endian
    ndig_raw = MAXD - jnp.argmax(jnp.flip(digs, axis=1) != 0, axis=1)
    ndig_raw = jnp.where(u == 0, 1, ndig_raw)
    if scale > 0:
        int_digits = jnp.maximum(ndig_raw - scale, 1)
        total_len = int_digits + 1 + scale + negative.astype(jnp.int32)
    else:
        int_digits = ndig_raw
        total_len = ndig_raw + negative.astype(jnp.int32)
    pos = jnp.arange(w)[None, :]
    # position of each output char, mapped back to digit index
    sign_off = negative.astype(jnp.int32)[:, None]
    if scale > 0:
        # layout: [-] D... '.' d*scale
        dot_pos = sign_off + int_digits[:, None]
        is_sign = (pos == 0) & negative[:, None]
        is_dot = pos == dot_pos
        # digit index (big-endian position among all digits incl frac)
        digit_pos = jnp.where(pos < dot_pos, pos - sign_off, pos - sign_off - 1)
        n_all = int_digits[:, None] + scale
        little_idx = n_all - 1 - digit_pos
        valid_digit = (digit_pos >= 0) & (digit_pos < n_all)
    else:
        is_sign = (pos == 0) & negative[:, None]
        is_dot = jnp.zeros_like(is_sign)
        digit_pos = pos - sign_off
        n_all = int_digits[:, None]
        little_idx = n_all - 1 - digit_pos
        valid_digit = (digit_pos >= 0) & (digit_pos < n_all)
    little_idx_c = jnp.clip(little_idx, 0, MAXD - 1)
    dig_chars = jnp.take_along_axis(digs, little_idx_c.astype(jnp.int32), axis=1) + _DIGIT0
    chars = jnp.where(is_sign, ord("-"), jnp.where(is_dot, ord("."), jnp.where(valid_digit, dig_chars, 0)))
    chars = jnp.where(pos < total_len[:, None], chars, 0)
    return ColumnVector(chars.astype(jnp.uint8), cv.validity, total_len.astype(jnp.int32), to)


def _timestamp_to_string(cv: ColumnVector, to: T.DataType) -> ColumnVector:
    """Spark cast(timestamp as string): 'yyyy-MM-dd HH:mm:ss[.f{1,6}]' with
    trailing fraction zeros trimmed (UTC rendering; session-tz rendering goes
    through from_utc_timestamp first). Reference: cast.rs timestamp formatter."""
    micros = cv.data.astype(jnp.int64)
    base = _format_timestamp_string(micros, cv.validity)  # 19 chars
    frac = jnp.mod(jnp.mod(micros, np.int64(86_400_000_000)) + np.int64(86_400_000_000),
                   np.int64(1_000_000))
    Z = ord("0")
    digs = [(frac // np.int64(10 ** (5 - i)) % 10).astype(jnp.int32) for i in range(6)]
    # number of fraction digits = 6 - trailing zeros (0 if frac == 0)
    ndig = jnp.zeros_like(frac, jnp.int32)
    seen = jnp.zeros_like(frac, bool)
    for i in range(5, -1, -1):
        seen = seen | (digs[i] != 0)
        ndig = jnp.where(seen & (ndig == 0), i + 1, ndig)
    w = max(to.byte_width, 26)
    mat = jnp.zeros((cv.capacity, w), jnp.uint8)
    mat = mat.at[:, :19].set(base.data[:, :19])
    has_frac = frac > 0
    mat = mat.at[:, 19].set(jnp.where(has_frac, ord("."), 0).astype(jnp.uint8))
    for i in range(6):
        ch = jnp.where(has_frac & (i < ndig), digs[i] + Z, 0).astype(jnp.uint8)
        mat = mat.at[:, 20 + i].set(ch)
    lens = jnp.where(has_frac, 20 + ndig, 19).astype(jnp.int32)
    out_w = to.byte_width
    if out_w < w:
        mat = mat[:, :out_w]
        lens = jnp.minimum(lens, out_w)
    elif out_w > w:
        mat = _pad_width(mat, out_w)
    return ColumnVector(mat, cv.validity, lens, to)


def _string_to_timestamp(cv: ColumnVector, to: T.DataType, mode: str, ctx) -> ColumnVector:
    """Parse 'yyyy-MM-dd[ HH:mm[:ss[.f{1,6}]]]' ('T' separator accepted) —
    the common subset of Spark's stringToTimestamp (cast.rs)."""
    mat = cv.data.astype(jnp.int32)
    lens = cv.lengths
    cap, w = mat.shape
    pos = jnp.arange(w)[None, :]
    in_str = pos < lens[:, None]
    nonspace = in_str & (mat != 32)
    first = jnp.argmax(nonspace, axis=1)
    last = w - 1 - jnp.argmax(jnp.flip(nonspace, axis=1), axis=1)
    has = jnp.any(nonspace, axis=1)
    n = last - first + 1

    def ch(i):
        return jnp.take_along_axis(mat, jnp.clip(first + i, 0, w - 1)[:, None], axis=1)[:, 0]

    def dig(i):
        c = ch(i)
        return c - _DIGIT0, (c >= _DIGIT0) & (c <= _DIGIT0 + 9)

    ok = has & (n >= 10)
    vals, oks = zip(*[dig(i) for i in [0, 1, 2, 3, 5, 6, 8, 9]])
    for o in oks:
        ok = ok & o
    ok = ok & (ch(4) == ord("-")) & (ch(7) == ord("-"))
    y = vals[0] * 1000 + vals[1] * 100 + vals[2] * 10 + vals[3]
    mo = vals[4] * 10 + vals[5]
    d = vals[6] * 10 + vals[7]
    days = _days_from_civil(y, mo, d)
    micros = days * np.int64(86_400_000_000)
    has_time = n >= 16
    sep_ok = (ch(10) == ord(" ")) | (ch(10) == ord("T"))
    hh_d, hh_ok = dig(11)
    hh2_d, hh2_ok = dig(12)
    mi_d, mi_ok = dig(14)
    mi2_d, mi2_ok = dig(15)
    time_ok = sep_ok & hh_ok & hh2_ok & mi_ok & mi2_ok & (ch(13) == ord(":"))
    hh = hh_d * 10 + hh2_d
    mi = mi_d * 10 + mi2_d
    has_sec = n >= 19
    ss_d, ss_ok = dig(17)
    ss2_d, ss2_ok = dig(18)
    sec_ok = ss_ok & ss2_ok & (ch(16) == ord(":"))
    ss = ss_d * 10 + ss2_d
    # fraction: '.', then up to 6 digits
    has_frac = n >= 21
    frac_ok = ch(19) == ord(".")
    frac = jnp.zeros(cap, jnp.int64)
    fdigits = jnp.clip(n - 20, 0, 6)
    for i in range(6):
        fd, fok = dig(20 + i)
        use = i < fdigits
        frac = frac + jnp.where(use, fd.astype(jnp.int64) * np.int64(10 ** (5 - i)), 0)
        frac_ok = frac_ok & (fok | ~use)
    micros = micros + jnp.where(
        has_time & time_ok, hh.astype(jnp.int64) * 3_600_000_000 + mi.astype(jnp.int64) * 60_000_000, 0
    )
    micros = micros + jnp.where(has_sec & sec_ok, ss.astype(jnp.int64) * 1_000_000, 0)
    micros = micros + jnp.where(has_frac & frac_ok, frac, 0)
    ok = ok & (mo >= 1) & (mo <= 12) & (d >= 1) & (d <= 31)
    ok = ok & jnp.where(has_time, time_ok & (hh < 24) & (mi < 60), n == 10)
    ok = ok & jnp.where(has_sec, sec_ok & (ss < 60), ~has_sec | ~has_time)
    ok = ok & jnp.where(has_frac, frac_ok, True)
    if mode == E.EvalMode.ANSI:
        ctx.record_error(~ok & cv.validity, "CAST_INVALID_INPUT")
    return ColumnVector(micros, cv.validity & ok, None, to)


def _cast_string_to(cv: ColumnVector, frm: T.DataType, to: T.DataType, mode: str, ctx,
                    tz=None) -> ColumnVector:
    """string → int/float/date/bool/decimal, vectorized parse with Spark
    trim-then-parse semantics (subset: no scientific notation for ints)."""
    mat = cv.data.astype(jnp.int32)
    lens = cv.lengths
    cap, w = mat.shape
    pos = jnp.arange(w)[None, :]
    in_str = pos < lens[:, None]
    is_space = (mat == 32) & in_str
    nonspace = in_str & ~is_space
    first = jnp.argmax(nonspace, axis=1)
    last = w - 1 - jnp.argmax(jnp.flip(nonspace, axis=1), axis=1)
    has_content = jnp.any(nonspace, axis=1)
    if to.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ"):
        out = _string_to_timestamp(cv, to, mode, ctx)
        if tz and to.type_id == "TIMESTAMP":
            # parsed wall clock in the session tz -> instant
            micros = out.data.astype(jnp.int64)
            micros = micros - _tz_offset_micros(micros, tz, local=True)
            out = ColumnVector(micros, out.validity, None, to)
        return out
    if to.type_id == "DATE":
        # expect yyyy-mm-dd (Spark accepts more; subset)
        def dig(i):
            return jnp.take_along_axis(mat, (first + i)[:, None], axis=1)[:, 0] - _DIGIT0

        y = dig(0) * 1000 + dig(1) * 100 + dig(2) * 10 + dig(3)
        m = dig(5) * 10 + dig(6)
        d = dig(8) * 10 + dig(9)
        ok = has_content & ((last - first) == 9)
        days = _days_from_civil(y, m, d)
        validity = cv.validity & ok
        if mode == E.EvalMode.ANSI:
            ctx.record_error(~ok & cv.validity, "CAST_INVALID_INPUT")
        return ColumnVector(days.astype(jnp.int32), validity, None, to)
    if to.is_integer or to.is_decimal:
        signc = jnp.take_along_axis(mat, first[:, None], axis=1)[:, 0]
        neg = signc == ord("-")
        plus = signc == ord("+")
        start = first + (neg | plus)
        rel = pos - start[:, None]
        active = (pos >= start[:, None]) & (pos <= last[:, None])
        ch = jnp.where(active, mat, _DIGIT0)
        is_dig = (ch >= _DIGIT0) & (ch <= _DIGIT0 + 9)
        is_dot = ch == ord(".")
        ok_chars = jnp.all(jnp.where(active, is_dig | is_dot, True), axis=1)
        dot_count = jnp.sum(jnp.where(active & is_dot, 1, 0), axis=1)
        scale_target = to.scale if to.is_decimal else 0
        # digits after the dot
        dot_pos = jnp.where(dot_count > 0, jnp.argmax(active & is_dot, axis=1), last + 1)
        # accumulate integer value of all digits, tracking implied scale
        val = jnp.zeros(cap, jnp.int64)
        for i in range(w):
            c = ch[:, i]
            d_ok = active[:, i] & (c >= _DIGIT0) & (c <= _DIGIT0 + 9)
            val = jnp.where(d_ok, val * 10 + (c - _DIGIT0).astype(jnp.int64), val)
        frac_digits = jnp.where(dot_count > 0, last - dot_pos, 0).astype(jnp.int32)
        # rescale to target scale
        k = scale_target - frac_digits
        factor = jnp.power(jnp.asarray(10, jnp.int64), jnp.clip(k, 0, 18))
        shrink = jnp.power(jnp.asarray(10, jnp.int64), jnp.clip(-k, 0, 18))
        half = shrink // 2
        val_scaled = jnp.where(k >= 0, val * factor, (val + half) // shrink)
        val_final = jnp.where(neg, -val_scaled, val_scaled)
        ok = has_content & ok_chars & (dot_count <= 1)
        if to.is_integer:
            ok = ok & (dot_count == 0)
            if mode == E.EvalMode.ANSI:
                ctx.record_error(~ok & cv.validity, "CAST_INVALID_INPUT")
            out = _int_narrow(val_final, cv.validity & ok, to, mode, ctx)
            return ColumnVector(out.data, cv.validity & ok, None, to)
        if mode == E.EvalMode.ANSI:
            ctx.record_error(~ok & cv.validity, "CAST_INVALID_INPUT")
        return ColumnVector(val_final, cv.validity & ok, None, to)
    if to.is_floating:
        # parse sign, digits, dot, exponent — vectorized float build
        signc = jnp.take_along_axis(mat, first[:, None], axis=1)[:, 0]
        neg = signc == ord("-")
        plus = signc == ord("+")
        start = first + (neg | plus)
        active = (pos >= start[:, None]) & (pos <= last[:, None])
        ch = jnp.where(active, mat, _DIGIT0)
        is_dig = (ch >= _DIGIT0) & (ch <= _DIGIT0 + 9)
        is_dot = ch == ord(".")
        ok_chars = jnp.all(jnp.where(active, is_dig | is_dot, True), axis=1)
        mantissa = jnp.zeros(cap, jnp.float64)
        frac_seen = jnp.zeros(cap, jnp.int32)
        for i in range(w):
            c = ch[:, i]
            d_ok = active[:, i] & (c >= _DIGIT0) & (c <= _DIGIT0 + 9)
            mantissa = jnp.where(d_ok, mantissa * 10 + (c - _DIGIT0), mantissa)
            frac_seen = frac_seen + jnp.where(active[:, i] & is_dot[:, i], 0, 0)
        dot_pos = jnp.where(jnp.any(active & is_dot, axis=1), jnp.argmax(active & is_dot, axis=1), last + 1)
        frac_digits = jnp.where(dot_pos <= last, last - dot_pos, 0)
        value = mantissa / jnp.power(10.0, frac_digits.astype(jnp.float64))
        value = jnp.where(neg, -value, value)
        ok = has_content & ok_chars
        return ColumnVector(value.astype(to.np_dtype()), cv.validity & ok, None, to)
    if to.is_boolean:
        # accept 'true'/'false'/'t'/'f'/'1'/'0' etc. — subset: true/false/1/0
        l0 = jnp.take_along_axis(mat, first[:, None], axis=1)[:, 0]
        tl = last - first + 1
        is_true = ((l0 | 32) == ord("t")) | ((tl == 1) & (l0 == ord("1")))
        is_false = ((l0 | 32) == ord("f")) | ((tl == 1) & (l0 == ord("0")))
        ok = has_content & (is_true | is_false)
        return ColumnVector(is_true, cv.validity & ok, None, to)
    raise NotImplementedError(f"cast string -> {to!r}")


# -------------------------------------------------------------------------------------
# case / in
# -------------------------------------------------------------------------------------


def _case_when(e: E.CaseWhen, b: Batch, ctx: EvalContext) -> ColumnVector:
    out_t = e.dtype
    result = (
        _ev(e.else_value, b, ctx)
        if e.else_value is not None
        else _literal(_null_lit(out_t), b.capacity)
    )
    result = _coerce(result, out_t, ctx)
    # evaluate in reverse so earlier branches take precedence
    result = _dedict(result)
    for cond, value in reversed(e.branches):
        c = _ev(cond, b, ctx)
        v = _dedict(_coerce(_ev(value, b, ctx), out_t, ctx))
        if out_t.is_decimal and (v.is_wide_storage != result.is_wide_storage):
            # same wide dtype, mixed storage (one branch proved narrow by
            # bounds, the other not): unify on two-limb before the select
            from datafusion_comet_tpu.exec import decimal_wide as DW

            v, result = DW.widen_cv(v), DW.widen_cv(result)
        take = c.validity & c.data.astype(bool)
        data = _select_cv(take, v, result)
        validity = jnp.where(take, v.validity, result.validity)
        lengths = None
        if out_t.is_binary:
            lengths = jnp.where(take, v.lengths, result.lengths)
        result = ColumnVector(data, validity, lengths, out_t)
    return result


def _select_cv(take: jax.Array, a: ColumnVector, b: ColumnVector) -> jax.Array:
    if a.data.ndim == 2:
        w = max(a.data.shape[1], b.data.shape[1])
        return jnp.where(take[:, None], _pad_width(a.data, w), _pad_width(b.data, w))
    return jnp.where(take, a.data, b.data)


def _null_lit(dt: T.DataType) -> E.Literal:
    lit = E.Literal(None, dt)
    object.__setattr__(lit, "dtype", dt)
    return lit


def _in_list(e: E.InList, b: Batch, ctx: EvalContext) -> ColumnVector:
    acc: Optional[ColumnVector] = None
    for v in e.values:
        cmp_node = E.BinaryOp("eq", e.child, v)
        object.__setattr__(cmp_node, "dtype", T.BOOL)
        eq = _binary(cmp_node, b, ctx)
        acc = eq if acc is None else _kleene("or", acc, eq)
    assert acc is not None
    if e.negated:
        return ColumnVector(~acc.data.astype(bool), acc.validity, None, T.BOOL)
    return acc


# -------------------------------------------------------------------------------------
# strings
# -------------------------------------------------------------------------------------


def _segment_match_positions(mat: jax.Array, lens: jax.Array, seg: bytes) -> jax.Array:
    """(cap, P) bool: does seg ('_' wildcard allowed) match at byte offset p?"""
    cap, w = mat.shape
    m = len(seg)
    P = max(w - m + 1, 1)
    if m == 0:
        return jnp.ones((cap, P), bool)
    acc = jnp.ones((cap, P), bool)
    base = jnp.arange(P)
    for j, chb in enumerate(seg):
        idx = jnp.minimum(base + j, w - 1)
        chars = mat[:, idx]
        if chb == ord("_"):
            ok = jnp.ones_like(chars, dtype=bool)
        else:
            ok = chars == chb
        acc = acc & ok
    # position must fit inside the string
    fits = (base[None, :] + m) <= lens[:, None]
    return acc & fits


def _like(e: E.Like, b: Batch, ctx: EvalContext) -> ColumnVector:
    cv = _ev(e.child, b, ctx)
    if cv.is_dict:
        # match over the K dictionary entries, map back by code
        return _eval_on_dict(cv, lambda s: _like_cv(e, s), ctx)
    return _like_cv(e, cv)


def _like_cv(e: E.Like, cv: ColumnVector) -> ColumnVector:
    pat = e.pattern
    segments = pat.split("%")
    anchored_start = not pat.startswith("%")
    anchored_end = not pat.endswith("%")
    segs = [s.encode("utf-8") for s in segments if s != ""]
    mat, lens = cv.data, cv.lengths
    cap, w = mat.shape
    if not segs:
        # pattern of only '%'s
        data = jnp.ones(cap, bool) if "%" in pat else lens == 0
        res = data
    else:
        cur = jnp.zeros(cap, jnp.int32)
        ok = jnp.ones(cap, bool)
        for i, seg in enumerate(segs):
            matches = _segment_match_positions(mat, lens, seg)
            P = matches.shape[1]
            if i == 0 and anchored_start:
                hit = matches[:, 0]
                ok = ok & hit
                cur = jnp.full(cap, len(seg), jnp.int32)
            else:
                poss = jnp.arange(P)[None, :]
                avail = matches & (poss >= cur[:, None])
                found = jnp.any(avail, axis=1)
                first_p = jnp.argmax(avail, axis=1)
                ok = ok & found
                cur = (first_p + len(seg)).astype(jnp.int32)
        if anchored_end:
            last = segs[-1]
            if len(segs) == 1 and anchored_start:
                ok = ok & (lens == len(last))
            else:
                # last segment must also match at the very end
                end_matches = _segment_match_positions(mat, lens, last)
                end_pos = jnp.maximum(lens - len(last), 0)
                hit_end = jnp.take_along_axis(
                    end_matches, jnp.minimum(end_pos, end_matches.shape[1] - 1)[:, None], axis=1
                )[:, 0]
                ok = ok & hit_end & (end_pos + len(last) >= cur)
        res = ok
    if e.negated:
        res = ~res
    return ColumnVector(res, cv.validity, None, T.BOOL)


def _string_func(e: E.StringFunc, b: Batch, ctx: EvalContext) -> ColumnVector:
    args = [_ev(a, b, ctx) for a in e.args]
    if (
        args
        and args[0].is_dict
        and all(isinstance(a, E.Literal) for a in e.args[1:])
    ):
        # single-string-input function: run over the K dictionary entries
        # (literal args re-materialized at K rows), map back by code
        lits = list(e.args[1:])

        def _small(s):
            sm = [s] + [_literal(a, s.capacity) for a in lits]
            return _string_func_impl(e, sm, ctx)

        return _eval_on_dict(args[0], _small, ctx)
    args = [_dedict(a) for a in args]
    return _string_func_impl(e, args, ctx)


def _bytes_func(e: E.StringFunc, args: List[ColumnVector], ctx: EvalContext) -> ColumnVector:
    """hex/unhex/base64/unbase64/encode/decode/bin/conv + digests — device
    kernels in exec/bytes_funcs.py (reference: math_funcs/unhex.rs,
    string_funcs/base64.rs; digests are DataFusion built-ins in the
    reference planner)."""
    from datafusion_comet_tpu.exec import bytes_funcs as BF

    f = e.func
    cv = args[0]
    if f == "hex":
        if cv.dtype.is_binary:
            data, lens = BF.hex_of_bytes(cv.data, cv.lengths, e.dtype)
        else:
            data, lens = BF.hex_of_int(cv.data, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "unhex":
        data, lens, invalid = BF.unhex(cv.data, cv.lengths, e.dtype)
        return ColumnVector(data, cv.validity & ~invalid, lens, e.dtype)
    if f == "base64":
        chunk = True
        if len(e.args) > 1 and isinstance(e.args[1], E.Literal):
            chunk = bool(e.args[1].value)
        data, lens = BF.base64_encode(cv.data, cv.lengths, e.dtype, chunk)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "unbase64":
        data, lens = BF.base64_decode(cv.data, cv.lengths, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f in ("encode", "decode"):
        charset = "utf-8"
        if len(e.args) > 1 and isinstance(e.args[1], E.Literal) and e.args[1].value is not None:
            charset = str(e.args[1].value).lower()
        if charset.replace("_", "-") not in ("utf-8", "utf8"):
            raise NotImplementedError(
                f"{f} charset {charset!r} (only UTF-8 is byte-identity on the "
                "padded-bytes representation)"
            )
        # UTF-8 string bytes == the stored bytes: identity reinterpret
        return ColumnVector(cv.data, cv.validity, cv.lengths, e.dtype)
    if f == "bin":
        data, lens = BF.bin_of_int(cv.data, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "conv":
        if not (isinstance(e.args[1], E.Literal) and isinstance(e.args[2], E.Literal)):
            raise NotImplementedError("conv requires literal from/to bases")
        fb, tb = int(e.args[1].value), int(e.args[2].value)
        if not (2 <= fb <= 36 and 2 <= abs(tb) <= 36):
            # Spark returns NULL for out-of-range bases
            return ColumnVector(
                jnp.zeros((cv.capacity, e.dtype.byte_width), jnp.uint8),
                jnp.zeros(cv.capacity, bool),
                jnp.zeros(cv.capacity, jnp.int32),
                e.dtype,
            )
        data, lens, null_out = BF.conv(cv.data, cv.lengths, fb, tb, e.dtype)
        return ColumnVector(data, cv.validity & ~null_out, lens, e.dtype)
    if f == "crc32":
        return ColumnVector(BF.crc32(cv.data, cv.lengths), cv.validity, None, T.INT64)
    if f == "md5":
        data, lens = BF.md5(cv.data, cv.lengths, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "sha1":
        data, lens = BF.sha1(cv.data, cv.lengths, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "sha2":
        bits = 256
        if len(e.args) > 1 and isinstance(e.args[1], E.Literal) and e.args[1].value is not None:
            bits = int(e.args[1].value)
        if bits not in (0, 224, 256, 384, 512):
            # Spark: invalid bit length -> NULL
            return ColumnVector(
                jnp.zeros((cv.capacity, e.dtype.byte_width), jnp.uint8),
                jnp.zeros(cv.capacity, bool),
                jnp.zeros(cv.capacity, jnp.int32),
                e.dtype,
            )
        data, lens = BF.sha2(cv.data, cv.lengths, bits, e.dtype)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    raise NotImplementedError(f"bytes func {f}")


def _string_func_impl(e: E.StringFunc, args: List[ColumnVector], ctx: EvalContext) -> ColumnVector:
    f = e.func
    cv = args[0]
    mat, lens = cv.data, cv.lengths
    cap, w = mat.shape if cv.dtype.is_binary else (cv.capacity, 0)
    if f in ("hex", "unhex", "base64", "unbase64", "encode", "decode", "bin",
             "conv", "md5", "sha1", "sha2", "crc32"):
        return _bytes_func(e, args, ctx)
    if f == "get_json_object":
        from datafusion_comet_tpu.exec.json_path import (
            device_get_json_object, parse_path)

        path_lit = e.args[1]
        assert isinstance(path_lit, E.Literal) and path_lit.value is not None
        steps = parse_path(str(path_lit.value))
        if steps is None:
            raise NotImplementedError(
                f"device JSON path: unsupported path {path_lit.value!r} "
                "(use ir.functions.get_json_object host bridge)")
        return device_get_json_object(cv, steps, e.dtype)
    if f == "json_array_length":
        from datafusion_comet_tpu.exec.json_path import (
            device_json_array_length)

        if cv.is_dict:
            return _eval_on_dict(cv, device_json_array_length, ctx)
        return device_json_array_length(cv)
    if f in ("length", "char_length"):
        return ColumnVector(lens.astype(jnp.int32), cv.validity, None, T.INT32)
    if f in ("bit_length",):
        return ColumnVector(lens.astype(jnp.int32) * 8, cv.validity, None, T.INT32)
    if f in ("octet_length",):
        return ColumnVector(lens.astype(jnp.int32), cv.validity, None, T.INT32)
    if f in ("upper", "lower"):
        is_lower = (mat >= ord("a")) & (mat <= ord("z"))
        is_upper = (mat >= ord("A")) & (mat <= ord("Z"))
        delta = jnp.asarray(32, jnp.uint8)
        if f == "upper":
            data = jnp.where(is_lower, mat - delta, mat)
        else:
            data = jnp.where(is_upper, mat + delta, mat)
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "ascii":
        first = mat[:, 0].astype(jnp.int32)
        data = jnp.where(lens > 0, first, 0)
        return ColumnVector(data, cv.validity, None, T.INT32)
    if f == "reverse":
        pos = jnp.arange(w)[None, :]
        src = jnp.clip(lens[:, None] - 1 - pos, 0, w - 1)
        data = jnp.take_along_axis(mat, src, axis=1)
        data = jnp.where(pos < lens[:, None], data, 0)
        return ColumnVector(data.astype(jnp.uint8), cv.validity, lens, e.dtype)
    if f == "substring":
        # Spark substring(str, pos, len): 1-based; pos=0 behaves like 1; negative from end
        p = args[1].data.astype(jnp.int32)
        if len(args) > 2:
            n = args[2].data.astype(jnp.int32)
        else:
            n = jnp.full(cap, w, jnp.int32)
        start = jnp.where(p > 0, p - 1, jnp.where(p == 0, 0, jnp.maximum(lens + p, 0)))
        n = jnp.maximum(n, 0)
        end = jnp.minimum(start + n, lens)
        out_len = jnp.maximum(end - start, 0)
        pos = jnp.arange(w)[None, :]
        src = jnp.clip(start[:, None] + pos, 0, w - 1)
        data = jnp.take_along_axis(mat, src, axis=1)
        data = jnp.where(pos < out_len[:, None], data, 0)
        return ColumnVector(data.astype(jnp.uint8), cv.validity, out_len, e.dtype)
    if f in ("left", "right"):
        n = jnp.maximum(args[1].data.astype(jnp.int32), 0)
        out_len = jnp.minimum(n, lens)
        pos = jnp.arange(w)[None, :]
        if f == "left":
            src = pos
        else:
            start = lens - out_len
            src = jnp.clip(start[:, None] + pos, 0, w - 1)
        data = jnp.take_along_axis(mat, src, axis=1)
        data = jnp.where(pos < out_len[:, None], data, 0)
        return ColumnVector(data.astype(jnp.uint8), cv.validity & args[1].validity, out_len, e.dtype)
    if f == "chr":
        # Spark chr(n): char of n % 256 (empty when n % 256 == 0 or n < 0)
        n = args[0].data.astype(jnp.int64)
        code = (n % 256).astype(jnp.int32)
        ok = (n >= 0) & (code > 0)
        data = jnp.where(ok, code, 0).astype(jnp.uint8)[:, None]
        return ColumnVector(data, args[0].validity, ok.astype(jnp.int32), e.dtype)
    if f == "space":
        out_w = e.dtype.byte_width
        n = jnp.clip(args[0].data.astype(jnp.int32), 0, out_w)
        pos = jnp.arange(out_w)[None, :]
        data = jnp.where(pos < n[:, None], ord(" "), 0).astype(jnp.uint8)
        return ColumnVector(data, args[0].validity, n, e.dtype)
    if f == "btrim":
        pos = jnp.arange(w)[None, :]
        in_str = pos < lens[:, None]
        if len(args) > 1:  # custom trim-character set
            tr = args[1]
            tw = tr.data.shape[1]
            member = jnp.zeros((cap, w), bool)
            for j in range(tw):
                is_tr = (mat == tr.data[:, j][:, None]) & (jnp.asarray(j) < tr.lengths[:, None])
                member = member | is_tr
            is_sp = member & in_str
            validity = cv.validity & tr.validity
        else:
            is_sp = (mat == 32) & in_str
            validity = cv.validity
        nonsp = in_str & ~is_sp
        any_ns = jnp.any(nonsp, axis=1)
        first = jnp.where(any_ns, jnp.argmax(nonsp, axis=1), 0).astype(jnp.int32)
        last = jnp.where(any_ns, w - 1 - jnp.argmax(jnp.flip(nonsp, axis=1), axis=1), -1).astype(jnp.int32)
        out_len = jnp.maximum(last - first + 1, 0)
        src = jnp.clip(first[:, None] + pos, 0, w - 1)
        data = jnp.take_along_axis(mat, src, axis=1)
        data = jnp.where(pos < out_len[:, None], data, 0)
        return ColumnVector(data.astype(jnp.uint8), validity, out_len, e.dtype)
    if f == "concat_ws":
        # concat_ws(sep, s1, s2, ...): null args are SKIPPED; result null only
        # when the separator is null (Spark semantics)
        sep = args[0]
        parts = args[1:]
        total_w = e.dtype.byte_width
        out = jnp.zeros((cap, total_w), jnp.uint8)
        out_len = jnp.zeros(cap, jnp.int32)
        n_written = jnp.zeros(cap, jnp.int32)
        pos = jnp.arange(total_w)[None, :]

        def append(out, out_len, piece_mat, piece_len, use):
            aw = piece_mat.shape[1]
            src = jnp.clip(pos - out_len[:, None], 0, aw - 1)
            chunk = jnp.take_along_axis(_pad_width(piece_mat, max(total_w, aw))[:, :total_w], jnp.clip(pos - out_len[:, None], 0, total_w - 1), axis=1)
            eff = jnp.where(use, piece_len, 0)
            write = (pos >= out_len[:, None]) & (pos < (out_len + eff)[:, None])
            return jnp.where(write, chunk, out), out_len + eff

        for a in parts:
            use = a.validity
            need_sep = use & (n_written > 0)
            out, out_len = append(out, out_len, sep.data, sep.lengths, need_sep)
            out, out_len = append(out, out_len, a.data, a.lengths, use)
            n_written = n_written + use.astype(jnp.int32)
        return ColumnVector(out, sep.validity, jnp.minimum(out_len, total_w), e.dtype)
    if f in ("startswith", "endswith", "contains"):
        pat = args[1]
        pw = pat.data.shape[1]
        validity = cv.validity & pat.validity
        if f == "startswith":
            comp = jnp.where(
                jnp.arange(pw)[None, :] < pat.lengths[:, None],
                _pad_width(mat, max(w, pw))[:, :pw] == pat.data,
                True,
            )
            data = jnp.all(comp, axis=1) & (pat.lengths <= lens)
        elif f == "endswith":
            pos = jnp.arange(pw)[None, :]
            start = jnp.maximum(lens - pat.lengths, 0)
            src = jnp.clip(start[:, None] + pos, 0, max(w - 1, 0))
            tail = jnp.take_along_axis(_pad_width(mat, max(w, pw)), src, axis=1)[:, :pw]
            comp = jnp.where(pos < pat.lengths[:, None], tail == pat.data, True)
            data = jnp.all(comp, axis=1) & (pat.lengths <= lens)
        else:
            P = max(w - 1 + 1, 1)
            acc = jnp.ones((cap, P), bool)
            base = jnp.arange(P)
            for j in range(pw):
                idx = jnp.minimum(base + j, w - 1)
                chars = mat[:, idx]
                pj = pat.data[:, j][:, None]
                ok = (chars == pj) | (jnp.asarray(j) >= pat.lengths[:, None])
                acc = acc & ok
            fits = (base[None, :] + pat.lengths[:, None]) <= lens[:, None]
            data = jnp.any(acc & fits, axis=1) | (pat.lengths == 0)
        return ColumnVector(data, validity, None, T.BOOL)
    if f == "concat":
        total_w = e.dtype.byte_width
        out = jnp.zeros((cap, total_w), jnp.uint8)
        out_len = jnp.zeros(cap, jnp.int32)
        validity = jnp.ones(cap, bool)
        pos = jnp.arange(total_w)[None, :]
        for a in args:
            aw = a.data.shape[1]
            src = jnp.clip(pos - out_len[:, None], 0, aw - 1)
            chunk = jnp.take_along_axis(_pad_width(a.data, max(total_w, aw))[:, :total_w] if aw < total_w else a.data[:, :total_w], jnp.clip(pos - out_len[:, None], 0, total_w - 1), axis=1)
            write = (pos >= out_len[:, None]) & (pos < (out_len + a.lengths)[:, None])
            out = jnp.where(write, chunk, out)
            out_len = out_len + a.lengths
            validity = validity & a.validity
        return ColumnVector(out, validity, jnp.minimum(out_len, total_w), e.dtype)
    if f in ("trim", "ltrim", "rtrim"):
        pos = jnp.arange(w)[None, :]
        in_str = pos < lens[:, None]
        is_sp = (mat == 32) & in_str
        nonsp = in_str & ~is_sp
        any_ns = jnp.any(nonsp, axis=1)
        first = jnp.where(any_ns, jnp.argmax(nonsp, axis=1), 0).astype(jnp.int32)
        last = jnp.where(any_ns, w - 1 - jnp.argmax(jnp.flip(nonsp, axis=1), axis=1), -1).astype(jnp.int32)
        if f == "ltrim":
            start, end = first, lens - 1
        elif f == "rtrim":
            start, end = jnp.zeros_like(first), last
        else:
            start, end = first, last
        start = jnp.where(any_ns, start, 0)
        end = jnp.where(any_ns, end, -1)
        out_len = jnp.maximum(end - start + 1, 0)
        src = jnp.clip(start[:, None] + pos, 0, w - 1)
        data = jnp.take_along_axis(mat, src, axis=1)
        data = jnp.where(pos < out_len[:, None], data, 0)
        return ColumnVector(data.astype(jnp.uint8), cv.validity, out_len, e.dtype)
    if f in ("lpad", "rpad"):
        # lpad(str, len, pad): Spark truncates when len < length(str)
        n_target = args[1].data.astype(jnp.int32)
        pad = args[2] if len(args) > 2 else None
        out_w = e.dtype.byte_width
        pos = jnp.arange(out_w)[None, :]
        tgt = jnp.clip(n_target, 0, out_w)
        if f == "rpad":
            src = jnp.clip(pos, 0, max(w - 1, 0))
            from_str = jnp.take_along_axis(_pad_width(mat, max(out_w, w))[:, :out_w], jnp.clip(pos, 0, out_w - 1), axis=1)
            in_str = pos < jnp.minimum(lens, tgt)[:, None]
            if pad is not None:
                pw = max(pad.data.shape[1], 1)
                pidx = ((pos - lens[:, None]) % jnp.maximum(pad.lengths, 1)[:, None]).astype(jnp.int32)
                padch = jnp.take_along_axis(pad.data, jnp.clip(pidx, 0, pw - 1), axis=1)
            else:
                padch = jnp.full((cap, out_w), 32, jnp.uint8)
            data = jnp.where(in_str, from_str, padch)
        else:
            shift = jnp.maximum(tgt - lens, 0)
            sidx = jnp.clip(pos - shift[:, None], 0, max(w - 1, 0))
            from_str = jnp.take_along_axis(_pad_width(mat, max(out_w, w))[:, : max(w, 1)], sidx, axis=1)[:, :out_w] if w else jnp.zeros((cap, out_w), jnp.uint8)
            in_str = (pos >= shift[:, None]) & (pos < tgt[:, None])
            if pad is not None:
                pw = max(pad.data.shape[1], 1)
                pidx = (pos % jnp.maximum(pad.lengths, 1)[:, None]).astype(jnp.int32)
                padch = jnp.take_along_axis(pad.data, jnp.clip(pidx, 0, pw - 1), axis=1)
            else:
                padch = jnp.full((cap, out_w), 32, jnp.uint8)
            data = jnp.where(in_str, from_str, padch)
        data = jnp.where(pos < tgt[:, None], data, 0).astype(jnp.uint8)
        validity = cv.validity & args[1].validity
        return ColumnVector(data, validity, tgt, e.dtype)
    if f == "repeat":
        ntimes = args[1].data.astype(jnp.int32)
        out_w = e.dtype.byte_width
        pos = jnp.arange(out_w)[None, :]
        out_len = jnp.clip(lens * jnp.maximum(ntimes, 0), 0, out_w)
        sidx = (pos % jnp.maximum(lens, 1)[:, None]).astype(jnp.int32)
        data = jnp.take_along_axis(_pad_width(mat, max(out_w, w)), jnp.clip(sidx, 0, max(w - 1, 0)), axis=1)[:, :out_w]
        data = jnp.where(pos < out_len[:, None], data, 0).astype(jnp.uint8)
        return ColumnVector(data, cv.validity & args[1].validity, out_len, e.dtype)
    if f == "replace":
        # replace(str, search, repl) with literal search/replace of EQUAL
        # length (general case needs variable-length rebuild — planned);
        # unequal lengths fall back to a host-precompiled segment plan later.
        search, repl = args[1], args[2]
        return _replace_equal_len(cv, search, repl, e.dtype)
    if f == "translate":
        # translate(str, from, to): per-char mapping (from/to literals)
        frm, to_ = e.args[1], e.args[2]
        assert isinstance(frm, E.Literal) and isinstance(to_, E.Literal)
        fb = frm.value.encode() if isinstance(frm.value, str) else bytes(frm.value)
        tb = to_.value.encode() if isinstance(to_.value, str) else bytes(to_.value)
        lut = np.arange(256, dtype=np.int16)
        for i, ch in enumerate(fb):
            lut[ch] = tb[i] if i < len(tb) else -1  # -1 = delete (unsupported: keep)
        lut = np.where(lut < 0, 0, lut).astype(np.uint8)
        data = jnp.asarray(lut)[mat.astype(jnp.int32)]
        return ColumnVector(data, cv.validity, lens, e.dtype)
    if f == "initcap":
        pos = jnp.arange(w)[None, :]
        prev_sep = jnp.concatenate(
            [jnp.ones((cap, 1), bool), (mat[:, :-1] == 32)], axis=1
        )
        is_lower = (mat >= ord("a")) & (mat <= ord("z"))
        is_upper = (mat >= ord("A")) & (mat <= ord("Z"))
        up = jnp.where(prev_sep & is_lower, mat - 32, mat)
        low = jnp.where(~prev_sep & is_upper, up + 32, up)
        return ColumnVector(low.astype(jnp.uint8), cv.validity, lens, e.dtype)
    if f == "levenshtein":
        return _levenshtein(cv, args[1])
    if f == "instr" or f == "locate":
        # 1-based position of first occurrence, 0 if absent
        pat = args[1] if f == "instr" else args[0]
        s = cv if f == "instr" else args[1]
        smat, slens = s.data, s.lengths
        sw = smat.shape[1]
        pw = pat.data.shape[1]
        P = sw
        acc = jnp.ones((cap, P), bool)
        base = jnp.arange(P)
        for j in range(pw):
            idx = jnp.minimum(base + j, sw - 1)
            chars = smat[:, idx]
            pj = pat.data[:, j][:, None]
            ok = (chars == pj) | (jnp.asarray(j) >= pat.lengths[:, None])
            acc = acc & ok
        fits = (base[None, :] + pat.lengths[:, None]) <= slens[:, None]
        m = acc & fits
        found = jnp.any(m, axis=1)
        data = jnp.where(found, jnp.argmax(m, axis=1) + 1, 0).astype(jnp.int32)
        return ColumnVector(data, s.validity & pat.validity, None, T.INT32)
    raise NotImplementedError(f"string func {f}")


def _replace_equal_len(cv: ColumnVector, search: ColumnVector, repl: ColumnVector, out_t: T.DataType) -> ColumnVector:
    """replace() for equal-length search/replace byte strings: overwrite each
    match position, vectorized over match offsets."""
    mat, lens = cv.data, cv.lengths
    cap, w = mat.shape
    sw = search.data.shape[1]
    # match mask at each position
    base = jnp.arange(w)
    acc = jnp.ones((cap, w), bool)
    for j in range(sw):
        idx = jnp.minimum(base + j, w - 1)
        ok = (mat[:, idx] == search.data[:, j][:, None]) | (jnp.asarray(j) >= search.lengths[:, None])
        acc = acc & ok
    fits = (base[None, :] + search.lengths[:, None]) <= lens[:, None]
    starts = acc & fits & (search.lengths[:, None] > 0)
    # greedy non-overlapping matches: sequential cover pass over positions
    run = jnp.zeros(cap, jnp.int32)
    cols = []
    for p in range(w):
        is_start = starts[:, p] & (run <= 0)
        run = jnp.where(is_start, search.lengths, run)
        cols.append(jnp.where(run > 0, search.lengths - run, -1))
        run = run - 1
    offin = jnp.stack(cols, axis=1)  # offset within match else -1
    ridx = jnp.clip(offin, 0, max(repl.data.shape[1] - 1, 0))
    rch = jnp.take_along_axis(_pad_width(repl.data, max(repl.data.shape[1], 1)), ridx, axis=1)
    data = jnp.where(offin >= 0, rch, mat).astype(jnp.uint8)
    return ColumnVector(data, cv.validity & search.validity & repl.validity, lens, out_t)


def _levenshtein(a: ColumnVector, b: ColumnVector) -> ColumnVector:
    """Edit distance via anti-diagonal DP, vectorized over rows (reference:
    string_funcs levenshtein). O(w_a * w_b) fori steps of vector ops."""
    am, al = a.data.astype(jnp.int32), a.lengths
    bm, bl = b.data.astype(jnp.int32), b.lengths
    cap, wa = am.shape
    wb = bm.shape[1]
    # dp over b-length dimension, iterate over a positions; entries past bl
    # never influence dp[bl] (the scan runs left→right)
    init = jnp.broadcast_to(jnp.arange(wb + 1, dtype=jnp.int32)[None, :], (cap, wb + 1))

    def body(i, dp):
        prev_diag = dp[:, :-1]
        prev_up = dp[:, 1:]
        achar = am[:, i][:, None]
        sub_cost = (achar != bm) | (jnp.arange(wb)[None, :] >= bl[:, None])
        cand = jnp.minimum(prev_up + 1, prev_diag + sub_cost.astype(jnp.int32))
        first = dp[:, :1] + 1

        def scan_min(carry, x):
            v = jnp.minimum(x, carry + 1)
            return v, v

        # new_dp[j] = min(cand[j-1], new_dp[j-1]+1) — prefix scan
        _, rest = jax.lax.scan(scan_min, first[:, 0], cand.T)
        new_dp = jnp.concatenate([first, rest.T], axis=1)
        valid_i = i < al
        return jnp.where(valid_i[:, None], new_dp, dp)

    dp = jax.lax.fori_loop(0, wa, body, init)
    out = jnp.take_along_axis(dp, jnp.minimum(bl, wb)[:, None].astype(jnp.int32), axis=1)[:, 0]
    return ColumnVector(out.astype(jnp.int32), a.validity & b.validity, None, T.INT32)


# -------------------------------------------------------------------------------------
# temporal
# -------------------------------------------------------------------------------------


def _civil_from_days(days: jax.Array):
    """days since 1970-01-01 → (year, month, day); Hinnant's algorithm."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def _days_from_civil(y: jax.Array, m: jax.Array, d: jax.Array) -> jax.Array:
    y = y.astype(jnp.int64)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    y_adj = jnp.where(m <= 2, y - 1, y)
    era = jnp.where(y_adj >= 0, y_adj, y_adj - 399) // 400
    yoe = y_adj - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _temporal_func(e: E.TemporalFunc, b: Batch, ctx: EvalContext) -> ColumnVector:
    f = e.func
    args = [_ev(a, b, ctx) for a in e.args]
    cv = args[0]
    if cv.dtype.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ"):
        micros0 = cv.data.astype(jnp.int64)
        # session-timezone extraction: shift instant to wall-clock first
        if e.tz and f not in ("from_utc_timestamp", "to_utc_timestamp",
                              "date_trunc", "from_unixtime", "unix_timestamp",
                              "unix_micros", "unix_millis", "unix_seconds",
                              "convert_timezone", "timestampadd",
                              "timestampdiff"):
            micros0 = micros0 + _tz_offset_micros(micros0, e.tz, local=False)
        days = jnp.floor_divide(micros0, np.int64(86_400_000_000))
        micros_in_day = micros0 - days * np.int64(86_400_000_000)
    else:
        days = cv.data.astype(jnp.int64)
        micros_in_day = jnp.zeros_like(days)
    validity = cv.validity
    if f in ("year", "month", "day", "quarter", "dayofweek", "dayofyear", "weekofyear"):
        y, m, d = _civil_from_days(days)
        if f == "year":
            data = y
        elif f == "month":
            data = m
        elif f == "day":
            data = d
        elif f == "quarter":
            data = (m - 1) // 3 + 1
        elif f == "dayofweek":
            # Spark: 1 = Sunday. 1970-01-01 is Thursday (5).
            data = ((days + 4) % 7 + 1).astype(jnp.int32)
        elif f == "dayofyear":
            jan1 = _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
            data = (days - jan1 + 1).astype(jnp.int32)
        else:  # weekofyear (ISO 8601)
            # ISO week: week of the Thursday of this week
            dow = (days + 3) % 7  # 0 = Monday
            thursday = days - dow + 3
            ty, _, _ = _civil_from_days(thursday)
            jan1 = _days_from_civil(ty, jnp.ones_like(ty), jnp.ones_like(ty))
            data = ((thursday - jan1) // 7 + 1).astype(jnp.int32)
        return ColumnVector(data.astype(jnp.int32), validity, None, T.INT32)
    if f in ("hour", "minute", "second"):
        secs = micros_in_day // 1_000_000
        data = {
            "hour": secs // 3600,
            "minute": (secs // 60) % 60,
            "second": secs % 60,
        }[f]
        return ColumnVector(data.astype(jnp.int32), validity, None, T.INT32)
    if f in ("date_add", "date_sub"):
        delta = args[1].data.astype(jnp.int64)
        data = days + delta if f == "date_add" else days - delta
        return ColumnVector(data.astype(jnp.int32), validity & args[1].validity, None, T.DATE)
    if f == "datediff":
        d2 = args[1]
        days2 = d2.data.astype(jnp.int64)
        return ColumnVector((days - days2).astype(jnp.int32), validity & d2.validity, None, T.INT32)
    if f == "unix_date":
        return ColumnVector(days.astype(jnp.int32), validity, None, T.INT32)
    if f == "last_day":
        y, m, d = _civil_from_days(days)
        ny = jnp.where(m == 12, y + 1, y)
        nm = jnp.where(m == 12, 1, m + 1)
        data = _days_from_civil(ny, nm, jnp.ones_like(d)) - 1
        return ColumnVector(data.astype(jnp.int32), validity, None, T.DATE)
    if f == "trunc_date":
        # args[1] = literal unit string
        unit = e.args[1].value.lower() if isinstance(e.args[1], E.Literal) else "month"
        y, m, d = _civil_from_days(days)
        if unit in ("year", "yyyy", "yy"):
            data = _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
        elif unit in ("quarter",):
            qm = ((m - 1) // 3) * 3 + 1
            data = _days_from_civil(y, qm, jnp.ones_like(d))
        elif unit in ("month", "mon", "mm"):
            data = _days_from_civil(y, m, jnp.ones_like(d))
        elif unit in ("week",):
            dow = (days + 3) % 7  # 0 = Monday
            data = days - dow
        else:
            raise NotImplementedError(f"trunc unit {unit}")
        return ColumnVector(data.astype(jnp.int32), validity, None, T.DATE)
    if f in ("from_utc_timestamp", "to_utc_timestamp"):
        tz = e.args[1].value if len(e.args) > 1 and isinstance(e.args[1], E.Literal) else e.tz
        micros = cv.data.astype(jnp.int64)
        off = _tz_offset_micros(micros, tz, local=(f == "to_utc_timestamp"))
        data = micros + off if f == "from_utc_timestamp" else micros - off
        rt = T.TIMESTAMP_NTZ if f == "from_utc_timestamp" else T.TIMESTAMP
        return ColumnVector(data, validity, None, rt)
    if f == "unix_timestamp":
        return ColumnVector(
            jnp.floor_divide(cv.data.astype(jnp.int64), np.int64(1_000_000)),
            validity, None, T.INT64,
        )
    if f == "unix_micros":
        return ColumnVector(cv.data.astype(jnp.int64), validity, None, T.INT64)
    if f == "unix_millis":
        return ColumnVector(
            jnp.floor_divide(cv.data.astype(jnp.int64), np.int64(1000)),
            validity, None, T.INT64,
        )
    if f in ("timestamp_seconds", "timestamp_millis", "timestamp_micros"):
        mult = {"timestamp_seconds": 1_000_000, "timestamp_millis": 1000, "timestamp_micros": 1}[f]
        return ColumnVector(
            cv.data.astype(jnp.int64) * np.int64(mult), validity, None, T.TIMESTAMP
        )
    if f == "date_trunc":
        # args: (unit literal, ts); tz-aware: truncate in wall-clock space
        unit = e.args[0].value.lower() if isinstance(e.args[0], E.Literal) else "day"
        ts = args[1]
        micros = ts.data.astype(jnp.int64)
        off = _tz_offset_micros(micros, e.tz, local=False) if e.tz else jnp.int64(0)
        local = micros + off
        MU_DAY = np.int64(86_400_000_000)
        ldays = jnp.floor_divide(local, MU_DAY)
        in_day = local - ldays * MU_DAY
        if unit in ("second", "minute", "hour"):
            q = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000}[unit]
            data = local - (in_day % np.int64(q))
        elif unit in ("day", "dd"):
            data = ldays * MU_DAY
        elif unit == "week":
            dow = (ldays + 3) % 7
            data = (ldays - dow) * MU_DAY
        elif unit in ("month", "mon", "mm", "quarter", "year", "yyyy", "yy"):
            y, m, d = _civil_from_days(ldays)
            if unit in ("month", "mon", "mm"):
                days0 = _days_from_civil(y, m, jnp.ones_like(d))
            elif unit == "quarter":
                days0 = _days_from_civil(y, ((m - 1) // 3) * 3 + 1, jnp.ones_like(d))
            else:
                days0 = _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
            data = days0 * MU_DAY
        else:
            raise NotImplementedError(f"date_trunc unit {unit}")
        data = data - off
        return ColumnVector(data, ts.validity, None, T.TIMESTAMP)
    if f == "add_months":
        n = args[1].data.astype(jnp.int64)
        y, m, d = _civil_from_days(days)
        tot = (y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1)) + n
        ny = tot // 12
        nm = (tot % 12) + 1
        # clamp day to last day of target month (Spark semantics)
        nxt_y = jnp.where(nm == 12, ny + 1, ny)
        nxt_m = jnp.where(nm == 12, 1, nm + 1)
        last = _days_from_civil(nxt_y, nxt_m, jnp.ones_like(nm)) - _days_from_civil(ny, nm, jnp.ones_like(nm))
        nd = jnp.minimum(d.astype(jnp.int64), last)
        data = _days_from_civil(ny, nm, nd)
        return ColumnVector(data.astype(jnp.int32), validity & args[1].validity, None, T.DATE)
    if f == "weekday":
        # Spark weekday: 0 = Monday (1970-01-01 is Thursday = 3)
        data = ((days + 3) % 7).astype(jnp.int32)
        return ColumnVector(data, validity, None, T.INT32)
    if f == "unix_seconds":
        return ColumnVector(jnp.floor_divide(micros0, np.int64(1_000_000)),
                            validity, None, T.INT64)
    if f in ("timestampadd", "timestampdiff"):
        unit = (e.unit or "SECOND").upper()
        MICROS = {"MICROSECOND": 1, "MILLISECOND": 1_000, "SECOND": 1_000_000,
                  "MINUTE": 60_000_000, "HOUR": 3_600_000_000,
                  "DAY": 86_400_000_000, "WEEK": 7 * 86_400_000_000}
        if f == "timestampadd":
            qty = args[1].data.astype(jnp.int64)
            ok = validity & args[1].validity
            if unit in MICROS:
                return ColumnVector(micros0 + qty * np.int64(MICROS[unit]),
                                    ok, None, T.TIMESTAMP)
            months = qty * np.int64({"MONTH": 1, "QUARTER": 3, "YEAR": 12}[unit])
            y, m, d = _civil_from_days(days)
            tot = (y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1)) + months
            ny, nm = tot // 12, (tot % 12) + 1
            nxt_y = jnp.where(nm == 12, ny + 1, ny)
            nxt_m = jnp.where(nm == 12, 1, nm + 1)
            last = _days_from_civil(nxt_y, nxt_m, jnp.ones_like(nm)) - _days_from_civil(ny, nm, jnp.ones_like(nm))
            nd = jnp.minimum(d.astype(jnp.int64), last)
            out_days = _days_from_civil(ny, nm, nd)
            return ColumnVector(out_days * np.int64(86_400_000_000) + micros_in_day,
                                ok, None, T.TIMESTAMP)
        # timestampdiff(unit, start=args[0], end=args[1]) — whole units
        end = args[1].data.astype(jnp.int64)
        ok = validity & args[1].validity
        if unit in MICROS:
            diff = end - micros0  # whole units, truncated toward zero
            q = jnp.sign(diff) * (jnp.abs(diff) // np.int64(MICROS[unit]))
            return ColumnVector(q.astype(jnp.int64), ok, None, T.INT64)
        # calendar months between, truncated toward zero (Spark semantics)
        ed = jnp.floor_divide(end, np.int64(86_400_000_000))
        y1, m1, d1 = _civil_from_days(days)
        y2, m2, d2 = _civil_from_days(ed)
        t1 = micros0 - days * np.int64(86_400_000_000)
        t2 = end - ed * np.int64(86_400_000_000)
        mdiff = (y2.astype(jnp.int64) - y1) * 12 + (m2.astype(jnp.int64) - m1)
        # partial month: shrink toward zero when the day/time hasn't reached
        before = (d2 < d1) | ((d2 == d1) & (t2 < t1))
        after = (d2 > d1) | ((d2 == d1) & (t2 > t1))
        mdiff = jnp.where((mdiff > 0) & before, mdiff - 1, mdiff)
        mdiff = jnp.where((mdiff < 0) & after, mdiff + 1, mdiff)
        div = np.int64({"MONTH": 1, "QUARTER": 3, "YEAR": 12}[unit])
        q = jnp.sign(mdiff) * (jnp.abs(mdiff) // div)  # truncate toward zero
        return ColumnVector(q.astype(jnp.int64), ok, None, T.INT64)
    if f == "convert_timezone":
        # convert_timezone(srcTz, tgtTz, ts_ntz): reinterpret the wall clock
        # from source zone to target zone (Spark 3.4+)
        src, tgt = e.tz, e.unit  # carried as (tz=src, unit=tgt) plan constants
        wall = micros0
        instant = wall - _tz_offset_micros(wall, src, local=True) if src else wall
        out = instant + _tz_offset_micros(instant, tgt, local=False) if tgt else instant
        return ColumnVector(out, validity, None, T.TIMESTAMP_NTZ)
    if f == "months_between":
        # Spark: whole months + day fraction over 31, 8-digit rounding;
        # same day-of-month (or both month-ends) → integral result
        t2 = args[1]
        if t2.dtype.type_id in ("TIMESTAMP", "TIMESTAMP_NTZ"):
            days2 = jnp.floor_divide(t2.data, np.int64(86_400_000_000))
            mic2 = t2.data - days2 * np.int64(86_400_000_000)
        else:
            days2 = t2.data.astype(jnp.int64)
            mic2 = jnp.zeros_like(days2)
        y1, m1, d1 = _civil_from_days(days)
        y2, m2, d2 = _civil_from_days(days2)
        months = (y1 - y2) * 12 + (m1 - m2)
        last1 = (_civil_from_days(days + 1)[1] != m1)
        last2 = (_civil_from_days(days2 + 1)[1] != m2)
        both_last = last1 & last2
        sec1 = d1.astype(jnp.float64) * 86400 + micros_in_day.astype(jnp.float64) / 1e6
        sec2 = d2.astype(jnp.float64) * 86400 + mic2.astype(jnp.float64) / 1e6
        frac = (sec1 - sec2) / (31.0 * 86400.0)
        res = months.astype(jnp.float64) + jnp.where(
            both_last | (d1 == d2), 0.0, frac
        )
        res = jnp.round(res * 1e8) / 1e8
        return ColumnVector(res, validity & t2.validity, None, T.FLOAT64)
    if f == "next_day":
        # args[1]: literal day-of-week name
        dow_names = {"mon": 0, "tue": 1, "wed": 2, "thu": 3, "fri": 4, "sat": 5, "sun": 6}
        name = str(e.args[1].value).lower()[:3]
        target = dow_names.get(name)
        if target is None:
            return ColumnVector(jnp.zeros_like(days, jnp.int32), jnp.zeros_like(validity), None, T.DATE)
        cur = (days + 3) % 7  # 0 = Monday
        delta = (target - cur) % 7
        delta = jnp.where(delta == 0, 7, delta)
        return ColumnVector((days + delta).astype(jnp.int32), validity, None, T.DATE)
    if f == "make_date":
        y, m, d = (a.data.astype(jnp.int64) for a in args)
        ok = (m >= 1) & (m <= 12) & (d >= 1) & (d <= 31)
        data = _days_from_civil(y, jnp.clip(m, 1, 12), jnp.clip(d, 1, 31))
        # reject day overflow (e.g. Feb 30): round-trip check
        ry, rm, rd = _civil_from_days(data)
        ok = ok & (ry.astype(jnp.int64) == y) & (rm.astype(jnp.int64) == m) & (rd.astype(jnp.int64) == d)
        v = validity & args[1].validity & args[2].validity & ok
        return ColumnVector(data.astype(jnp.int32), v, None, T.DATE)
    if f == "from_unixtime":
        secs = cv.data.astype(jnp.int64)
        micros = secs * np.int64(1_000_000)
        off = _tz_offset_micros(micros, e.tz, local=False) if e.tz else jnp.int64(0)
        local = micros + off
        return _format_timestamp_string(local, validity)
    raise NotImplementedError(f"temporal func {f}")


def _tz_offset_micros(micros: jax.Array, tz: Optional[str], local: bool) -> jax.Array:
    """UTC offset (µs) of each instant in ``tz``. ``local=True`` interprets
    the input as wall-clock time (reverse lookup)."""
    from datafusion_comet_tpu.utils.tz import local_to_utc_offsets, utc_to_local_offsets

    trans, offs = (local_to_utc_offsets if local else utc_to_local_offsets)(tz or "UTC")
    secs = jnp.floor_divide(micros, np.int64(1_000_000))
    if len(trans) == 0:
        return jnp.full_like(micros, np.int64(int(offs[0]) * 1_000_000))
    idx = jnp.searchsorted(jnp.asarray(trans), secs, side="right")
    return jnp.take(jnp.asarray(offs.astype(np.int64)), idx) * np.int64(1_000_000)


def _format_timestamp_string(local_micros: jax.Array, validity: jax.Array) -> ColumnVector:
    """Device-side 'yyyy-MM-dd HH:mm:ss' rendering: each character position
    is a small integer computation over the whole column."""
    MU_DAY = np.int64(86_400_000_000)
    days = jnp.floor_divide(local_micros, MU_DAY)
    secs = (local_micros - days * MU_DAY) // np.int64(1_000_000)
    y, mo, d = _civil_from_days(days)
    hh = secs // 3600
    mi = (secs // 60) % 60
    ss = secs % 60
    Z = ord("0")

    def dig(v, p):
        return ((v // p) % 10 + Z).astype(jnp.uint8)

    dash = jnp.full(y.shape, ord("-"), jnp.uint8)
    colon = jnp.full(y.shape, ord(":"), jnp.uint8)
    space = jnp.full(y.shape, ord(" "), jnp.uint8)
    parts = [
        dig(y, 1000), dig(y, 100), dig(y, 10), dig(y, 1), dash,
        dig(mo, 10), dig(mo, 1), dash,
        dig(d, 10), dig(d, 1), space,
        dig(hh, 10), dig(hh, 1), colon,
        dig(mi, 10), dig(mi, 1), colon,
        dig(ss, 10), dig(ss, 1),
    ]
    mat = jnp.stack(parts, axis=1)
    lens = jnp.full(y.shape, 19, jnp.int32)
    return ColumnVector(mat, validity, lens, T.string(19))


# -------------------------------------------------------------------------------------
# math
# -------------------------------------------------------------------------------------


def _math_func(e: E.MathFunc, b: Batch, ctx: EvalContext) -> ColumnVector:
    f = e.func
    args = [_ev(a, b, ctx) for a in e.args]
    cv = args[0]
    out = e.dtype
    if f == "round":
        d = int(e.args[1].value) if len(e.args) > 1 else 0
        if cv.dtype.is_decimal:
            k = cv.dtype.scale - out.scale
            data = (
                _decimal_downscale_half_up_i64(cv.data.astype(jnp.int64), k)
                if k > 0
                else _rescale_up_i64(cv.data.astype(jnp.int64), -k)
            )
            return ColumnVector(data, cv.validity, None, out)
        if cv.dtype.is_integer:
            if d >= 0:
                return cv
            p = np.int64(10 ** (-d))
            data = ((cv.data + jnp.sign(cv.data) * (p // 2)) // p) * p
            return ColumnVector(data.astype(cv.data.dtype), cv.validity, None, out)
        # float round HALF_UP (Spark) — implement via scaled half-away rounding
        factor = 10.0**d
        x = cv.data * factor
        data = (jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)) / factor
        return ColumnVector(data, cv.validity, None, out)
    if f == "width_bucket":
        # Spark WidthBucket.computeBucketNumber (reference maps it to
        # datafusion-spark SparkWidthBucket, jni_api.rs:68): null when
        # numBucket <= 0 / Long.MaxValue, value is NaN, min == max, or
        # min/max is NaN/inf; v < lower -> 0, v >= upper -> n+1, else linear
        # bucket index + 1; a descending (min > max) range counts downward.
        v = _coerce(args[0], T.FLOAT64, ctx).data
        lo = _coerce(args[1], T.FLOAT64, ctx).data
        hi = _coerce(args[2], T.FLOAT64, ctx).data
        n = _coerce(args[3], T.INT64, ctx).data.astype(jnp.int64)
        valid = args[0].validity & args[1].validity & args[2].validity & args[3].validity
        bad = (
            (n <= 0)
            | (n == jnp.int64(0x7FFFFFFFFFFFFFFF))
            | jnp.isnan(v)
            | (lo == hi)
            | jnp.isnan(lo)
            | jnp.isinf(lo)
            | jnp.isnan(hi)
            | jnp.isinf(hi)
        )
        lower = jnp.minimum(lo, hi)
        upper = jnp.maximum(lo, hi)
        nf = n.astype(jnp.float64)
        span = upper - lower
        asc = (nf * (v - lower) / jnp.where(span == 0, 1.0, span)).astype(jnp.int64) + 1
        desc = (nf * (upper - v) / jnp.where(span == 0, 1.0, span)).astype(jnp.int64) + 1
        up_is_max = lo < hi
        below = jnp.where(up_is_max, v < lower, v > upper)
        above = jnp.where(up_is_max, v >= upper, v <= lower)
        bucket = jnp.where(below, 0, jnp.where(above, n + 1, jnp.where(up_is_max, asc, desc)))
        return ColumnVector(bucket.astype(jnp.int64), valid & ~bad, None, T.INT64)
    if f in ("floor", "ceil"):
        if cv.dtype.is_decimal:
            s = cv.dtype.scale
            dnum = np.int64(10**s)
            q = cv.data // dnum
            r = cv.data - q * dnum
            if f == "floor":
                data = q
            else:
                data = q + (r != 0)
            return ColumnVector(data.astype(jnp.int64), cv.validity, None, out)
        if cv.dtype.is_integer:
            return cv
        fn = jnp.floor if f == "floor" else jnp.ceil
        return ColumnVector(fn(cv.data).astype(jnp.int64), cv.validity, None, out)
    if f in ("sqrt", "exp", "ln", "log10", "log2", "sin", "cos", "tan", "asin",
             "acos", "atan", "cbrt", "expm1", "log1p", "sinh", "cosh", "tanh",
             "degrees", "radians", "signum", "acosh", "asinh", "atanh", "cot",
             "csc", "sec", "rint"):
        x = _coerce(cv, T.FLOAT64, ctx).data
        fn = {
            "sqrt": jnp.sqrt,
            "exp": jnp.exp,
            "ln": jnp.log,
            "log10": jnp.log10,
            "log2": jnp.log2,
            "sin": jnp.sin,
            "cos": jnp.cos,
            "tan": jnp.tan,
            "asin": jnp.arcsin,
            "acos": jnp.arccos,
            "atan": jnp.arctan,
            "cbrt": jnp.cbrt,
            "expm1": jnp.expm1,
            "log1p": jnp.log1p,
            "sinh": jnp.sinh,
            "cosh": jnp.cosh,
            "tanh": jnp.tanh,
            "degrees": jnp.degrees,
            "radians": jnp.radians,
            "signum": jnp.sign,
            "acosh": jnp.arccosh,
            "asinh": jnp.arcsinh,
            "atanh": jnp.arctanh,
            "cot": lambda v: 1.0 / jnp.tan(v),
            "csc": lambda v: 1.0 / jnp.sin(v),
            "sec": lambda v: 1.0 / jnp.cos(v),
            "rint": jnp.rint,
        }[f]
        valid = cv.validity
        if f in ("ln", "log10", "log2"):
            # Spark: log of a non-positive value is NULL (not NaN/-Inf)
            valid = valid & (x > 0.0)
        if f == "log1p":
            valid = valid & (x > -1.0)
        return ColumnVector(fn(x), valid, None, T.FLOAT64)
    if f == "factorial":
        # Spark factorial(n): defined for 0..20, NULL outside
        table = np.ones(21, np.int64)
        for i in range(2, 21):
            table[i] = table[i - 1] * i
        n = cv.data.astype(jnp.int32)
        ok = cv.validity & (n >= 0) & (n <= 20)
        val = jnp.take(jnp.asarray(table), jnp.clip(n, 0, 20))
        return ColumnVector(val, ok, None, T.INT64)
    if f == "bit_count":
        x = cv.data.astype(jnp.int64)
        cnt = jax.lax.population_count(jax.lax.bitcast_convert_type(x, jnp.uint64))
        return ColumnVector(cnt.astype(jnp.int32), cv.validity, None, T.INT32)
    if f == "getbit":
        x = _coerce(cv, T.INT64, ctx).data
        pos = _coerce(args[1], T.INT32, ctx).data.astype(jnp.int64)
        bit = jax.lax.shift_right_logical(x, jnp.clip(pos, 0, 63)) & jnp.int64(1)
        ok = cv.validity & args[1].validity & (pos >= 0) & (pos < 64)
        if ctx and e.eval_mode == E.EvalMode.ANSI:
            ctx.record_error(cv.validity & args[1].validity & ((pos < 0) | (pos >= 64)),
                             "INVALID_PARAMETER_VALUE")
        return ColumnVector(bit.astype(jnp.int8), ok, None, T.INT8)
    if f == "shiftrightunsigned":
        x = cv.data
        bits = 64 if x.dtype == jnp.int64 else 32
        s = _coerce(args[1], T.INT32, ctx).data % bits  # Java semantics: mod width
        val = jax.lax.shift_right_logical(x, s.astype(x.dtype))
        return ColumnVector(val, cv.validity & args[1].validity, None, out)
    if f == "nanvl":
        a = _coerce(args[0], T.FLOAT64, ctx)
        bb = _coerce(args[1], T.FLOAT64, ctx)
        nan = jnp.isnan(a.data)
        return ColumnVector(jnp.where(nan, bb.data, a.data),
                            a.validity & jnp.where(nan, bb.validity, True),
                            None, T.FLOAT64)
    if f == "bround":
        # round HALF_EVEN at scale d (Spark BRound); doubles + ints
        d = int(e.args[1].value) if len(e.args) > 1 and isinstance(e.args[1], E.Literal) else 0
        if cv.dtype.is_integer:
            if d >= 0:
                return cv
            m = np.int64(10 ** (-d))
            x = cv.data.astype(jnp.int64)
            q = x / m
            r = jnp.rint(q).astype(jnp.int64) * m
            return ColumnVector(r.astype(cv.dtype.np_dtype()), cv.validity, None, cv.dtype)
        if cv.dtype.is_decimal:
            raise NotImplementedError("bround over decimal")
        x = _coerce(cv, T.FLOAT64, ctx).data
        scale = 10.0 ** d
        return ColumnVector(jnp.rint(x * scale) / scale, cv.validity, None, T.FLOAT64)
    if f == "log" and len(args) == 2:
        # Logarithm(base, x): NULL for x <= 0 or base <= 0 (Spark)
        base = _coerce(args[0], T.FLOAT64, ctx).data
        x = _coerce(args[1], T.FLOAT64, ctx).data
        ok = args[0].validity & args[1].validity & (x > 0.0) & (base > 0.0)
        return ColumnVector(jnp.log(x) / jnp.log(base), ok, None, T.FLOAT64)
    if f in ("pow", "atan2", "hypot"):
        x = _coerce(args[0], T.FLOAT64, ctx).data
        y = _coerce(args[1], T.FLOAT64, ctx).data
        fn = {"pow": jnp.power, "atan2": jnp.arctan2, "hypot": jnp.hypot}[f]
        return ColumnVector(fn(x, y), args[0].validity & args[1].validity, None, T.FLOAT64)
    if f == "sign":
        x = _coerce(cv, T.FLOAT64, ctx).data
        return ColumnVector(jnp.sign(x), cv.validity, None, T.FLOAT64)
    if f in ("greatest", "least"):
        acc = _coerce(args[0], out, ctx)
        for a in args[1:]:
            a = _coerce(a, out, ctx)
            # greatest/least skip nulls
            if f == "greatest":
                better = (~acc.validity) | (a.validity & (a.data > acc.data))
            else:
                better = (~acc.validity) | (a.validity & (a.data < acc.data))
            take = a.validity & better
            acc = ColumnVector(jnp.where(take, a.data, acc.data), acc.validity | a.validity, None, out)
        return acc
    raise NotImplementedError(f"math func {f}")


# -------------------------------------------------------------------------------------
# hashes (Spark-exact murmur3 / xxhash64: reference
# native/spark-expr/src/hash_funcs/{murmur3,xxhash64}.rs)
# -------------------------------------------------------------------------------------


def _mm3_rotl(x, r):
    return (x << jnp.int32(r)) | jax.lax.shift_right_logical(x, jnp.int32(32 - r))


def _murmur3_mix_k1(k1):
    c1 = jnp.int32(-862048943)  # 0xcc9e2d51
    c2 = jnp.int32(0x1B873593)
    k1 = k1 * c1
    k1 = _mm3_rotl(k1, 15)
    return k1 * c2


def _murmur3_mix_h1(h1, k1):
    h1 = h1 ^ k1
    h1 = _mm3_rotl(h1, 13)
    return h1 * jnp.int32(5) + jnp.int32(-430675100)  # 0xe6546b64


def _murmur3_fmix(h1, length):
    h1 = h1 ^ length
    h1 = h1 ^ jax.lax.shift_right_logical(h1, jnp.int32(16))
    h1 = h1 * jnp.int32(-2048144789)  # 0x85ebca6b
    h1 = h1 ^ jax.lax.shift_right_logical(h1, jnp.int32(13))
    h1 = h1 * jnp.int32(-1028477387)  # 0xc2b2ae35
    return h1 ^ jax.lax.shift_right_logical(h1, jnp.int32(16))


def murmur3_hash_i32(value: jax.Array, seed: jax.Array) -> jax.Array:
    """Spark Murmur3_x86_32 hashInt."""
    k1 = _murmur3_mix_k1(value.astype(jnp.int32))
    h1 = _murmur3_mix_h1(seed.astype(jnp.int32), k1)
    return _murmur3_fmix(h1, jnp.int32(4))


def murmur3_hash_i64(value: jax.Array, seed: jax.Array) -> jax.Array:
    """Spark Murmur3_x86_32 hashLong: two 32-bit halves, low first."""
    v = value.astype(jnp.int64)
    low = v.astype(jnp.int32)
    high = jax.lax.shift_right_logical(v, jnp.int64(32)).astype(jnp.int32)
    h1 = _murmur3_mix_h1(seed.astype(jnp.int32), _murmur3_mix_k1(low))
    h1 = _murmur3_mix_h1(h1, _murmur3_mix_k1(high))
    return _murmur3_fmix(h1, jnp.int32(8))


def murmur3_hash_bytes(mat: jax.Array, lens: jax.Array, seed: jax.Array, max_len: int) -> jax.Array:
    """Spark hashUnsafeBytes on UTF8 bytes: 4-byte little-endian words then
    tail bytes one at a time (Spark's hashUnsafeBytesBlock: actually Spark
    uses hashUnsafeBytes which processes words then bytes)."""
    cap = mat.shape[0]
    w = mat.shape[1]
    h1 = jnp.broadcast_to(seed.astype(jnp.int32), (cap,))
    n_words_max = w // 4
    mi = mat.astype(jnp.int32)
    for i in range(n_words_max):
        word = (
            mi[:, 4 * i]
            | (mi[:, 4 * i + 1] << 8)
            | (mi[:, 4 * i + 2] << 16)
            | (mi[:, 4 * i + 3] << 24)
        )
        in_range = (4 * (i + 1)) <= lens
        k1 = _murmur3_mix_k1(word)
        h1 = jnp.where(in_range, _murmur3_mix_h1(h1, k1), h1)
    # tail bytes (Spark treats each remaining byte as signed int)
    for j in range(w):
        is_tail = (j >= (lens // 4) * 4) & (j < lens)
        bsigned = mi[:, j].astype(jnp.int8).astype(jnp.int32)
        k1 = _murmur3_mix_k1(bsigned)
        h1 = jnp.where(is_tail, _murmur3_mix_h1(h1, k1), h1)
    return _murmur3_fmix(h1, lens.astype(jnp.int32))


def _hash_func(e: E.HashFunc, b: Batch, ctx: EvalContext) -> ColumnVector:
    if e.func == "murmur3":
        h = jnp.full(b.capacity, e.seed, jnp.int32)
        for a in e.args:
            cv = _ev(a, b, ctx)
            h = _murmur3_column(cv, h)
        return ColumnVector(h, jnp.ones(b.capacity, bool), None, T.INT32)
    assert e.func == "xxhash64", f"hash {e.func} not implemented"
    h = jnp.full(b.capacity, e.seed, jnp.int64)
    for a in e.args:
        cv = _ev(a, b, ctx)
        h = _xxhash64_column(cv, h)
    return ColumnVector(h, jnp.ones(b.capacity, bool), None, T.INT64)


# ---- xxhash64 (Spark-exact: spark-expr/src/hash_funcs/xxhash64.rs) ------------------

_XXP1 = np.int64(-7046029288634856825)  # 0x9E3779B185EBCA87
_XXP2 = np.int64(-4417276706812531889)  # 0xC2B2AE3D27D4EB4F
_XXP3 = np.int64(1609587929392839161)  # 0x165667B19E3779F9
_XXP4 = np.int64(-8796714831421723037)  # 0x85EBCA77C2B2AE63
_XXP5 = np.int64(2870177450012600261)  # 0x27D4EB2F165667C5


def _rotl64(x, r):
    return (x << jnp.int64(r)) | jax.lax.shift_right_logical(x, jnp.int64(64 - r))


def _xx_fmix(h):
    h = h ^ jax.lax.shift_right_logical(h, jnp.int64(33))
    h = h * _XXP2
    h = h ^ jax.lax.shift_right_logical(h, jnp.int64(29))
    h = h * _XXP3
    return h ^ jax.lax.shift_right_logical(h, jnp.int64(32))


def xxhash64_i32(value: jax.Array, seed: jax.Array) -> jax.Array:
    """Spark XXH64.hashInt."""
    u32 = value.astype(jnp.int64) & np.int64(0xFFFFFFFF)
    h = seed + _XXP5 + 4
    h = h ^ (u32 * _XXP1)
    return _xx_fmix(_rotl64(h, 23) * _XXP2 + _XXP3)


def xxhash64_i64(value: jax.Array, seed: jax.Array) -> jax.Array:
    """Spark XXH64.hashLong."""
    h = seed + _XXP5 + 8
    h = h ^ (_rotl64(value.astype(jnp.int64) * _XXP2, 31) * _XXP1)
    return _xx_fmix(_rotl64(h, 27) * _XXP1 + _XXP4)


def xxhash64_bytes(mat: jax.Array, lens: jax.Array, seed: jax.Array) -> jax.Array:
    """Spark XXH64.hashUnsafeBytes: 32-byte stripes, then 8-byte words,
    then a 4-byte word, then tail bytes."""
    cap, w = mat.shape
    mi = mat.astype(jnp.int64)
    lens64 = lens.astype(jnp.int64)

    def word8(off_words):
        j = off_words * 8
        if j + 8 <= w:
            parts = [mi[:, j + k] << (8 * k) for k in range(8)]
        else:
            parts = [
                (mi[:, j + k] if j + k < w else jnp.zeros(cap, jnp.int64)) << (8 * k)
                for k in range(8)
            ]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out

    n_stripes_max = w // 32
    long_input = lens64 >= 32
    # accumulators
    v1 = seed + _XXP1 + _XXP2
    v2 = seed + _XXP2
    v3 = seed + 0
    v4 = seed - _XXP1

    def xx_round(acc, inp):
        return _rotl64(acc + inp * _XXP2, 31) * _XXP1

    stripes_done = jnp.zeros(cap, jnp.int64)
    for s in range(n_stripes_max):
        active = (jnp.int64((s + 1) * 32)) <= lens64
        w0, w1_, w2, w3 = (word8(s * 4 + k) for k in range(4))
        v1 = jnp.where(active, xx_round(v1, w0), v1)
        v2 = jnp.where(active, xx_round(v2, w1_), v2)
        v3 = jnp.where(active, xx_round(v3, w2), v3)
        v4 = jnp.where(active, xx_round(v4, w3), v4)
        stripes_done = stripes_done + active.astype(jnp.int64)

    def merge_acc(h, v):
        h = h ^ xx_round(jnp.zeros_like(v), v)
        return h * _XXP1 + _XXP4

    h_long = _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
    h_long = merge_acc(h_long, v1)
    h_long = merge_acc(h_long, v2)
    h_long = merge_acc(h_long, v3)
    h_long = merge_acc(h_long, v4)
    h = jnp.where(long_input, h_long, seed + _XXP5)
    h = h + lens64
    consumed = jnp.where(long_input, stripes_done * 32, 0)
    # remaining 8-byte words
    n_words_max = w // 8
    for j in range(n_words_max):
        off = jnp.int64(j * 8)
        active = (off >= consumed) & (off + 8 <= lens64)
        k1 = xx_round(jnp.zeros(cap, jnp.int64), word8(j))
        h = jnp.where(active, _rotl64(h ^ k1, 27) * _XXP1 + _XXP4, h)
    consumed2 = (lens64 // 8) * 8
    # one 4-byte word
    for j in range(w // 4 + 1):
        off = jnp.int64(j * 4)
        active = (off == consumed2) & (off + 4 <= lens64)
        if j * 4 + 4 <= w:
            word4 = (
                mi[:, j * 4]
                | (mi[:, j * 4 + 1] << 8)
                | (mi[:, j * 4 + 2] << 16)
                | (mi[:, j * 4 + 3] << 24)
            )
        else:
            word4 = jnp.zeros(cap, jnp.int64)
        h = jnp.where(active, _rotl64(h ^ (word4 * _XXP1), 23) * _XXP2 + _XXP3, h)
    consumed3 = (lens64 // 4) * 4
    # tail bytes
    for j in range(w):
        active = (jnp.int64(j) >= consumed3) & (jnp.int64(j) < lens64)
        h = jnp.where(active, _rotl64(h ^ ((mi[:, j] & 0xFF) * _XXP5), 11) * _XXP1, h)
    return _xx_fmix(h)


def _xxhash64_column(cv: ColumnVector, seed: jax.Array) -> jax.Array:
    dt = cv.dtype
    if dt.is_binary:
        cv = _dedict(cv)
        h = xxhash64_bytes(cv.data, cv.lengths, seed)
    elif dt.type_id in ("INT8", "INT16", "INT32", "DATE") or dt.is_boolean:
        h = xxhash64_i32(cv.data.astype(jnp.int32), seed)
    elif dt.type_id in ("INT64", "TIMESTAMP", "TIMESTAMP_NTZ"):
        h = xxhash64_i64(cv.data, seed)
    elif dt.type_id == "FLOAT":
        bits = jax.lax.bitcast_convert_type(
            jnp.where(cv.data == 0.0, jnp.zeros_like(cv.data), cv.data), jnp.int32
        )
        h = xxhash64_i32(bits, seed)
    elif dt.type_id == "DOUBLE":
        d = jnp.where(cv.data == 0.0, jnp.zeros_like(cv.data), cv.data)
        h = xxhash64_i64(_f64_bits_i64(d), seed)
    elif dt.is_decimal and dt.precision <= 18:
        h = xxhash64_i64(cv.data, seed)
    else:
        raise NotImplementedError(f"xxhash64 for {dt!r}")
    return jnp.where(cv.validity, h, seed)


def _f64_bits_i64(d: jax.Array) -> jax.Array:
    """float64 → IEEE-754 bits as int64 WITHOUT any bitcast (the TPU
    X64-rewrite has no f64 bitcast): reconstructs sign/exponent/mantissa via
    the exact power-of-two decomposition (sortkeys.f64_decompose). NaN is
    canonicalized like Java's doubleToLongBits (Spark hashing contract)."""
    from datafusion_comet_tpu.exec.sortkeys import f64_decompose

    nan = jnp.isnan(d)
    inf = jnp.isinf(d)
    zero = d == 0.0
    neg = (d < 0.0) & ~nan
    finite = ~zero & ~inf & ~nan
    e, m52 = f64_decompose(jnp.where(finite, d, 1.0))
    normal = e >= -1022
    exp_field = jnp.where(normal, e + 1023, 0).astype(jnp.int64)
    # subnormal: frac = floor((2^52 + m52) / 2^(1022 - e... )) with shift 1..52
    shift = jnp.clip(-1022 - e, 0, 52)  # 0 for normals
    m_full = m52 + np.float64(2.0**52)
    scale = jnp.ones_like(m_full)
    for k in (32, 16, 8, 4, 2, 1):
        hit = (shift & k) != 0
        scale = jnp.where(hit, scale * np.float64(2.0) ** (-k), scale)
    frac_sub = jnp.floor(m_full * scale)
    frac = jnp.where(normal, m52, frac_sub).astype(jnp.int64)
    frac = jnp.where(finite, frac, 0)
    exp_field = jnp.where(finite, exp_field, 0)
    bits = (exp_field << 52) | frac
    bits = jnp.where(inf, np.int64(0x7FF0000000000000), bits)
    bits = jnp.where(zero, np.int64(0), bits)
    bits = jnp.where(neg, bits | np.int64(-0x8000000000000000), bits)
    bits = jnp.where(nan, np.int64(0x7FF8000000000000), bits)
    return bits


def _murmur3_column(cv: ColumnVector, seed: jax.Array) -> jax.Array:
    """Hash one column into the running seed; null columns leave seed
    unchanged (Spark semantics)."""
    dt = cv.dtype
    if dt.is_binary:
        cv = _dedict(cv)
        h = murmur3_hash_bytes(cv.data, cv.lengths, seed, dt.byte_width)
    elif dt.type_id in ("INT8", "INT16", "INT32", "DATE") or dt.is_boolean:
        h = murmur3_hash_i32(cv.data.astype(jnp.int32), seed)
    elif dt.type_id in ("INT64", "TIMESTAMP", "TIMESTAMP_NTZ"):
        h = murmur3_hash_i64(cv.data, seed)
    elif dt.type_id == "FLOAT":
        bits = jax.lax.bitcast_convert_type(
            jnp.where(cv.data == 0.0, jnp.zeros_like(cv.data), cv.data), jnp.int32
        )
        h = murmur3_hash_i32(bits, seed)
    elif dt.type_id == "DOUBLE":
        # f64 bits via 2×i32 bitcast (TPU X64-rewrite has no f64→s64 bitcast)
        bits = _f64_bits_i64(jnp.where(cv.data == 0.0, jnp.zeros_like(cv.data), cv.data))
        h = murmur3_hash_i64(bits, seed)
    elif dt.is_decimal:
        if dt.precision <= 18:
            h = murmur3_hash_i64(cv.data, seed)
        else:
            raise NotImplementedError("wide decimal hash")
    else:
        raise NotImplementedError(f"murmur3 for {dt!r}")
    return jnp.where(cv.validity, h, seed)
