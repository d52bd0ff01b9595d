"""Host-side evaluation of cheap dimension filters for runtime-filter
injection (exec/runtime_filter.py).

The reference's runtime-filter machinery (bloom-filter join pushdown,
native/spark-expr/src/bloom_filter/; Spark's InjectRuntimeFilter) builds its
filter from the dimension side at *execution* time. On this engine every
compiled program costs a tunnel XLA compile, so the dimension side — always a
Scan→Filter(→Projection) chain over a small resident table — is evaluated
*on the host at plan time* instead: the surviving join-key set becomes a
constant build table for an injected semi join, with zero extra device
programs.

Soundness contract: a runtime filter may only be a SUPERSET of the true key
set (it must never drop a row that could match). Conjuncts this evaluator
does not understand are therefore simply *skipped* — the result is less
selective but still correct. ``applied`` reports whether at least one
conjunct actually ran (callers skip injection otherwise).

Supported conjuncts (vectorized numpy): comparisons on integers/dates/
decimals-as-ints, string equality, LIKE (prefix/suffix/contains/exact and
general %/_ patterns via per-segment matching), IN lists, IS [NOT] NULL,
AND/OR/NOT, with Alias/Cast-to-same-family transparency.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch
from datafusion_comet_tpu.ir import expr as E

__all__ = ["HostColumns", "eval_dim_filter", "host_columns_of"]


@dataclasses.dataclass
class _Col:
    """Host view of one column: numeric (vals) or string (mat/lens or
    dict codes+values); valid mask always present."""

    valid: np.ndarray
    vals: Optional[np.ndarray] = None  # numeric
    mat: Optional[np.ndarray] = None  # (n, w) uint8
    lens: Optional[np.ndarray] = None
    codes: Optional[np.ndarray] = None  # dict-encoded strings
    dict_values: Optional[List[bytes]] = None

    @property
    def is_string(self) -> bool:
        return self.mat is not None or self.codes is not None


class HostColumns:
    """Lazy host materialization of a resident Batch's columns by name."""

    def __init__(self, batch: Batch):
        self._batch = batch
        self._cols: Dict[str, _Col] = {}
        self.row_mask = np.asarray(batch.row_mask)

    def get(self, name: str) -> Optional[_Col]:
        if name in self._cols:
            return self._cols[name]
        try:
            i = self._batch.schema.index_of(name)
        except (KeyError, ValueError):
            return None
        cv = self._batch.columns[i]
        dt = cv.dtype
        valid = np.asarray(cv.validity)
        col: Optional[_Col] = None
        if cv.is_dict:
            d = cv.dictionary
            col = _Col(valid, codes=np.asarray(cv.data),
                       dict_values=[d.value_of(c) for c in range(d.size)])
        elif dt.is_binary:
            col = _Col(valid, mat=np.asarray(cv.data), lens=np.asarray(cv.lengths))
        elif cv.data.ndim == 1 and (dt.is_integer or dt.type_id in ("DATE",)
                                    or dt.is_decimal or dt.is_boolean):
            col = _Col(valid, vals=np.asarray(cv.data))
        if col is not None:
            self._cols[name] = col
        return col


def _conjuncts(e: E.Expr) -> List[E.Expr]:
    if isinstance(e, E.BinaryOp) and e.op == "and":
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def _strip(e: E.Expr) -> E.Expr:
    while isinstance(e, E.Alias):
        e = e.child
    return e


def _col_name(e: E.Expr) -> Optional[str]:
    e = _strip(e)
    # casts between integer widths / date→int are value-preserving for the
    # comparisons below; string casts are not transparent
    while isinstance(e, E.Cast) and (e.to.is_integer or e.to.type_id == "DATE"
                                     or e.to.is_decimal):
        e = _strip(e.child)
    if isinstance(e, (E.ColumnRef, E.BoundRef)):
        return e.col_name
    return None


def _lit_value(e: E.Expr):
    e = _strip(e)
    if isinstance(e, E.Literal):
        return e.value, e.lit_dtype
    return None


def _scale_lit(value, lit_dtype: T.DataType, col_dtype: T.DataType):
    """Numeric literal → the column's storage domain (decimal ints carry
    their scale)."""
    if value is None:
        return None
    if col_dtype.is_decimal:
        ls = lit_dtype.scale if lit_dtype.is_decimal else 0
        if isinstance(value, float):
            return int(round(value * (10 ** col_dtype.scale)))
        return int(value) * (10 ** (col_dtype.scale - ls)) if col_dtype.scale >= ls else None
    if isinstance(value, (int, np.integer)):
        return int(value)
    if isinstance(value, float) and float(value).is_integer():
        return int(value)
    return None


def _str_bytes(v) -> Optional[bytes]:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    return None


def _string_eq(col: _Col, pat: bytes) -> np.ndarray:
    if col.codes is not None:
        hits = np.array([dv == pat for dv in col.dict_values], bool)
        if not hits.any():
            return np.zeros(len(col.codes), bool)
        ok = hits[np.clip(col.codes, 0, len(hits) - 1)]
        return ok
    w = col.mat.shape[1]
    if len(pat) > w:
        return np.zeros(len(col.mat), bool)
    pad = pat + b"\x00" * (w - len(pat))
    return (col.lens == len(pat)) & (col.mat == np.frombuffer(pad, np.uint8)).all(axis=1)


def _decoded(col: _Col) -> List[Optional[bytes]]:
    if col.codes is not None:
        dv = col.dict_values
        return [dv[c] if 0 <= c < len(dv) else b"" for c in col.codes]
    return [bytes(col.mat[i, : col.lens[i]]) for i in range(len(col.mat))]


def _like_mask(col: _Col, pattern: str) -> np.ndarray:
    pat = pattern.encode("utf-8")
    n = len(col.codes) if col.codes is not None else len(col.mat)
    # dict-encoded: run the (tiny) dictionary through the generic matcher
    if col.codes is not None:
        rx = _like_regex(pat)
        hits = np.array([rx.fullmatch(dv) is not None for dv in col.dict_values], bool)
        return hits[np.clip(col.codes, 0, max(len(hits) - 1, 0))] if len(hits) else np.zeros(n, bool)
    mat, lens = col.mat, col.lens
    w = mat.shape[1]
    has_us = b"_" in pat
    segs = pat.split(b"%")
    if not has_us and len(segs) == 1:  # exact
        return _string_eq(col, pat)
    if not has_us and len(segs) == 2 and segs[0] and not segs[1]:  # 'abc%'
        p = segs[0]
        if len(p) > w:
            return np.zeros(n, bool)
        return (lens >= len(p)) & (mat[:, : len(p)] == np.frombuffer(p, np.uint8)).all(axis=1)
    if not has_us and len(segs) == 2 and segs[1] and not segs[0]:  # '%abc'
        p = np.frombuffer(segs[1], np.uint8)
        k = len(p)
        if k > w:
            return np.zeros(n, bool)
        wins = np.lib.stride_tricks.sliding_window_view(mat, k, axis=1)
        hit = (wins == p).all(axis=2)
        pos = lens - k
        ok = pos >= 0
        return ok & hit[np.arange(n), np.clip(pos, 0, w - k)]
    if not has_us and len(segs) == 3 and not segs[0] and not segs[2] and segs[1]:
        # '%abc%' contains
        p = np.frombuffer(segs[1], np.uint8)
        k = len(p)
        if k > w:
            return np.zeros(n, bool)
        wins = np.lib.stride_tricks.sliding_window_view(mat, k, axis=1)
        hit = (wins == p).all(axis=2)
        end_ok = np.arange(w - k + 1)[None, :] + k <= lens[:, None]
        return (hit & end_ok).any(axis=1)
    # general pattern: regex per row (dims are small)
    rx = _like_regex(pat)
    return np.array([rx.fullmatch(s) is not None for s in _decoded(col)], bool)


def _like_regex(pat: bytes) -> "re.Pattern":
    out = b""
    for ch in pat:
        b = bytes([ch])
        if b == b"%":
            out += b".*"
        elif b == b"_":
            out += b"."
        else:
            out += re.escape(b)
    return re.compile(out, re.DOTALL)


_CMP = {
    "eq": np.equal, "ne": np.not_equal, "lt": np.less,
    "le": np.less_equal, "gt": np.greater, "ge": np.greater_equal,
}


def _eval_conjunct(c: E.Expr, cols: HostColumns) -> Optional[np.ndarray]:
    """True/False mask under SQL semantics where NULL comparisons are False
    (sound for filtering). None = unsupported."""
    if isinstance(c, E.UnaryOp) and c.op == "not":
        inner = _eval_conjunct(c.child, cols)
        if inner is None:
            return None
        # NOT(x) where NULL rows were already False in inner would wrongly
        # pass; handle only when the child's columns are fully valid
        names = _expr_columns(c.child)
        if names is None:
            return None
        for nm in names:
            hc = cols.get(nm)
            if hc is None or not hc.valid.all():
                return None
        return ~inner
    if isinstance(c, E.UnaryOp) and c.op in ("isnull", "isnotnull"):
        nm = _col_name(c.child)
        hc = cols.get(nm) if nm else None
        if hc is None:
            return None
        return ~hc.valid if c.op == "isnull" else hc.valid.copy()
    if isinstance(c, E.BinaryOp) and c.op == "or":
        a = _eval_conjunct(c.left, cols)
        b = _eval_conjunct(c.right, cols)
        if a is None or b is None:
            return None
        return a | b
    if isinstance(c, E.BinaryOp) and c.op == "and":
        a = _eval_conjunct(c.left, cols)
        b = _eval_conjunct(c.right, cols)
        if a is None or b is None:
            return None
        return a & b
    if isinstance(c, E.Like):
        nm = _col_name(c.child)
        hc = cols.get(nm) if nm else None
        if hc is None or not hc.is_string:
            return None
        m = _like_mask(hc, c.pattern) & hc.valid
        return (~m & hc.valid) if c.negated else m
    if isinstance(c, E.InList):
        nm = _col_name(c.child)
        hc = cols.get(nm) if nm else None
        if hc is None:
            return None
        vals = [_lit_value(v) for v in c.values]
        if any(v is None for v in vals):
            return None
        if hc.is_string:
            pats = [_str_bytes(v) for v, _ in vals]
            if any(p is None for p in pats):
                return None
            m = np.zeros(len(hc.valid), bool)
            for p in pats:
                m |= _string_eq(hc, p)
        elif hc.vals is not None:
            try:
                i = cols._batch.schema.index_of(nm)
                cdt = cols._batch.columns[i].dtype
            except Exception:
                return None
            lits = [_scale_lit(v, dt, cdt) for v, dt in vals]
            if any(v is None for v in lits):
                return None
            m = np.isin(hc.vals, np.array(lits, dtype=np.int64))
        else:
            return None
        m = m & hc.valid
        return (~m & hc.valid) if c.negated else m
    if isinstance(c, E.BinaryOp) and c.op in _CMP:
        for a, b, flip in ((c.left, c.right, False), (c.right, c.left, True)):
            nm = _col_name(a)
            lit = _lit_value(b)
            if nm is None or lit is None:
                continue
            hc = cols.get(nm)
            if hc is None:
                continue
            op = c.op
            if flip:
                op = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}.get(op, op)
            value, ldt = lit
            if hc.is_string:
                if op not in ("eq", "ne"):
                    return None
                p = _str_bytes(value)
                if p is None:
                    return None
                m = _string_eq(hc, p)
                m = (~m & hc.valid) if op == "ne" else (m & hc.valid)
                return m
            if hc.vals is not None:
                try:
                    i = cols._batch.schema.index_of(nm)
                    cdt = cols._batch.columns[i].dtype
                except Exception:
                    return None
                v = _scale_lit(value, ldt, cdt)
                if v is None:
                    return None
                return _CMP[op](hc.vals, v) & hc.valid
        return None
    return None


def _expr_columns(e: E.Expr) -> Optional[List[str]]:
    e2 = _strip(e)
    if isinstance(e2, (E.ColumnRef, E.BoundRef)):
        return [e2.col_name]
    out: List[str] = []
    kids = e2.children()
    if not kids:
        return []
    for k in kids:
        sub = _expr_columns(k)
        if sub is None:
            return None
        out += sub
    return out


def eval_dim_filter(batch: Batch, predicates: List[E.Expr]) -> Tuple[np.ndarray, bool]:
    """Evaluate the conjunction of ``predicates`` over a resident batch on
    the host. Returns (mask over capacity rows incl. row_mask, applied):
    unsupported conjuncts are skipped (mask stays a superset); ``applied``
    is True when at least one conjunct was evaluated."""
    cols = HostColumns(batch)
    mask = cols.row_mask.copy()
    applied = False
    for p in predicates:
        for c in _conjuncts(p):
            m = _eval_conjunct(c, cols)
            if m is not None:
                mask &= m
                applied = True
    return mask, applied


def host_columns_of(batch: Batch) -> HostColumns:
    return HostColumns(batch)
