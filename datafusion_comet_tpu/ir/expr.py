"""Expression IR: the engine-agnostic expression tree + Spark type inference.

The analog of the reference's ``Expr`` proto oneof (~70 variants, reference:
native/proto/src/proto/expr.proto:31-97) plus the type-resolution rules that
Spark applies before serde. Expressions are built *unbound* (column names),
then ``bind(schema)`` resolves references to column indices and computes
result types — including Spark's decimal precision/scale arithmetic
(reference: native/spark-expr/src/math_funcs + Spark DecimalType.adjustPrecisionScale,
mirrored in QueryPlanSerde.scala arithmetic serde).

Evaluation lives in exec/evaluator.py: each node class names a kernel; the
evaluator compiles a bound tree into a pure JAX function over a Batch so XLA
fuses the whole expression (the analog of DataFusion's PhysicalExpr tree,
reference: native/core/src/execution/planner.rs:437 create_expr).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

from datafusion_comet_tpu import types as T

__all__ = [
    "Expr",
    "col",
    "lit",
    "EvalMode",
    "ColumnRef",
    "BoundRef",
    "Literal",
    "Alias",
    "BinaryOp",
    "UnaryOp",
    "Cast",
    "CaseWhen",
    "InList",
    "Like",
    "StringFunc",
    "TemporalFunc",
    "MathFunc",
    "LambdaVar",
    "HigherOrderFunc",
    "HashFunc",
    "ArrayExpr",
    "StructExpr",
    "GetStructField",
    "MapExpr",
    "RLike",
    "FormatNumber",
    "RegexpExtract",
    "RegexpExtractAll",
    "RegexpReplace",
    "Split",
    "SplitPart",
    "Soundex",
    "SubstringIndex",
    "PythonUdf",
    "BloomMightContain",
    "SortOrder",
    "AggExpr",
    "AggFunc",
    "WindowExpr",
    "WindowFrame",
    "ScalarSubquery",
    "RandExpr",
    "MonotonicallyIncreasingId",
    "SparkPartitionId",
    "bind",
]


class EvalMode:
    """Spark evaluation modes (reference: spark-expr/src/lib.rs:102 EvalMode)."""

    LEGACY = "LEGACY"
    ANSI = "ANSI"
    TRY = "TRY"


@dataclasses.dataclass(frozen=True)
class Expr:
    """Base expression node. Subclasses are frozen dataclasses; ``dtype`` is
    None until bound."""

    def children(self) -> Tuple["Expr", ...]:
        return ()

    dtype: Optional[T.DataType] = dataclasses.field(default=None, init=False)

    # Fluent builders -------------------------------------------------------------
    def alias(self, name: str) -> "Alias":
        return Alias(self, name)

    def cast(self, to: T.DataType, mode: str = EvalMode.LEGACY) -> "Cast":
        return Cast(self, to, mode)

    def is_null(self) -> "UnaryOp":
        return UnaryOp("isnull", self)

    def is_not_null(self) -> "UnaryOp":
        return UnaryOp("isnotnull", self)

    def __add__(self, o):
        return BinaryOp("add", self, _e(o))

    def __sub__(self, o):
        return BinaryOp("sub", self, _e(o))

    def __rsub__(self, o):
        return BinaryOp("sub", _e(o), self)

    def __radd__(self, o):
        return BinaryOp("add", _e(o), self)

    def __mul__(self, o):
        return BinaryOp("mul", self, _e(o))

    def __rmul__(self, o):
        return BinaryOp("mul", _e(o), self)

    def __truediv__(self, o):
        return BinaryOp("div", self, _e(o))

    def __mod__(self, o):
        return BinaryOp("mod", self, _e(o))

    def __eq__(self, o):  # type: ignore[override]
        return BinaryOp("eq", self, _e(o))

    def __ne__(self, o):  # type: ignore[override]
        return BinaryOp("ne", self, _e(o))

    def __lt__(self, o):
        return BinaryOp("lt", self, _e(o))

    def __le__(self, o):
        return BinaryOp("le", self, _e(o))

    def __gt__(self, o):
        return BinaryOp("gt", self, _e(o))

    def __ge__(self, o):
        return BinaryOp("ge", self, _e(o))

    def __and__(self, o):
        return BinaryOp("and", self, _e(o))

    def __or__(self, o):
        return BinaryOp("or", self, _e(o))

    def __invert__(self):
        return UnaryOp("not", self)

    def __hash__(self):
        return object.__hash__(self)

    def between(self, lo, hi) -> "Expr":
        return (self >= _e(lo)) & (self <= _e(hi))

    def isin(self, *values) -> "InList":
        return InList(self, tuple(_e(v) for v in values))

    def like(self, pattern: str) -> "Like":
        return Like(self, pattern)

    @property
    def name(self) -> str:
        return _default_name(self)


def _e(v: Any) -> "Expr":
    return v if isinstance(v, Expr) else lit(v)


def _default_name(e: "Expr") -> str:
    if isinstance(e, Alias):
        return e.out_name
    if isinstance(e, ColumnRef):
        return e.col_name
    if isinstance(e, BoundRef):
        return e.col_name
    return type(e).__name__.lower()


def _node(cls):
    """Decorator: frozen dataclass node with non-init dtype slot."""
    cls = dataclasses.dataclass(frozen=True, eq=False, repr=True)(cls)
    return cls


@_node
class ColumnRef(Expr):
    col_name: str


@_node
class BoundRef(Expr):
    index: int
    col_name: str
    ref_dtype: T.DataType

    def __post_init__(self):
        object.__setattr__(self, "dtype", self.ref_dtype)


@_node
class Literal(Expr):
    value: Any
    lit_dtype: T.DataType

    def __post_init__(self):
        object.__setattr__(self, "dtype", self.lit_dtype)


@_node
class Alias(Expr):
    child: Expr
    out_name: str

    def children(self):
        return (self.child,)


@_node
class BinaryOp(Expr):
    """Arithmetic: add/sub/mul/div/mod; comparison: eq/ne/lt/le/gt/ge,
    eqns (null-safe <=>); logic: and/or (Kleene); bitwise: band/bor/bxor,
    shiftleft/shiftright. Reference semantics: spark-expr math_funcs,
    predicate_funcs; comparison NaN ordering (NaN greatest, NaN == NaN for
    ordering) matches Spark."""

    op: str
    left: Expr
    right: Expr
    eval_mode: str = EvalMode.LEGACY

    def children(self):
        return (self.left, self.right)


@_node
class UnaryOp(Expr):
    """not / negate / isnull / isnotnull / isnan / abs."""

    op: str
    child: Expr
    eval_mode: str = EvalMode.LEGACY

    def children(self):
        return (self.child,)


@_node
class Cast(Expr):
    """Spark cast matrix subset (reference: spark-expr/src/conversion_funcs/cast.rs,
    support matrix spark/src/main/scala/org/apache/comet/expressions/CometCast.scala:175)."""

    child: Expr
    to: T.DataType
    eval_mode: str = EvalMode.LEGACY
    # session timezone for timestamp<->string/date casts (Spark's Cast
    # carries timeZoneId); None = UTC rendering/parsing
    timezone: Optional[str] = None

    def children(self):
        return (self.child,)


@_node
class CaseWhen(Expr):
    """CASE WHEN ... THEN ... [ELSE ...] END (also serves If)."""

    branches: Tuple[Tuple[Expr, Expr], ...]  # (condition, value)
    else_value: Optional[Expr]

    def children(self):
        out: List[Expr] = []
        for c, v in self.branches:
            out += [c, v]
        if self.else_value is not None:
            out.append(self.else_value)
        return tuple(out)


@_node
class InList(Expr):
    child: Expr
    values: Tuple[Expr, ...]
    negated: bool = False

    def children(self):
        return (self.child,) + self.values


@_node
class Like(Expr):
    """SQL LIKE with literal pattern ('%' and '_' wildcards). The pattern is
    compiled on the host into a segment-matching plan (reference:
    spark-expr/src/predicate_funcs/rlike.rs covers regex; LIKE is the common
    fast path)."""

    child: Expr
    pattern: str
    negated: bool = False

    def children(self):
        return (self.child,)


@_node
class StringFunc(Expr):
    """substring(pos,len)/upper/lower/length/concat/trim/ltrim/rtrim/
    startswith/endswith/contains/replace/lpad/rpad/ascii/instr/repeat/reverse.
    Reference: spark-expr/src/string_funcs/."""

    func: str
    args: Tuple[Expr, ...]

    def children(self):
        return self.args


@_node
class TemporalFunc(Expr):
    """year/month/day/quarter/dayofweek/dayofyear/hour/minute/second/
    date_add/date_sub/datediff/trunc_date/last_day/unix_date, plus the
    timezone-aware family: from_utc_timestamp/to_utc_timestamp/date_trunc/
    unix_timestamp/timestamp_seconds|millis|micros/unix_micros|millis/
    add_months/months_between/next_day/make_date/from_unixtime.
    ``tz`` (a plan-time constant) applies the named zone's offset before
    field extraction (Spark session-timezone semantics).
    Reference: spark-expr/src/datetime_funcs/ + timezone.rs."""

    func: str
    args: Tuple[Expr, ...]
    tz: Optional[str] = None
    unit: Optional[str] = None  # timestampadd/timestampdiff calendar unit

    def children(self):
        return self.args


@_node
class MathFunc(Expr):
    """round/floor/ceil/sqrt/exp/ln/log10/log2/pow/sin/cos/tan/atan/atan2/
    sign/greatest/least. Reference: spark-expr/src/math_funcs/."""

    func: str
    args: Tuple[Expr, ...]
    eval_mode: str = EvalMode.LEGACY

    def children(self):
        return self.args


@_node
class LambdaVar(Expr):
    """A lambda-bound variable inside a higher-order function body; its
    dtype is resolved from the enclosing HigherOrderFunc's element types at
    bind time (reference: Spark NamedLambdaVariable)."""

    var_name: str

    def children(self):
        return ()


@_node
class HigherOrderFunc(Expr):
    """Array higher-order functions with scalar lambdas (reference:
    spark-expr/src/array_funcs — ArrayTransform/Filter/Exists/ForAll/
    Aggregate/ZipWith/ArraySort). ``args`` are the array inputs (plus the
    init expression for ``aggregate``); ``params`` name the lambda
    variables usable in ``body``.

    funcs: transform | filter | exists | forall | aggregate | zip_with |
    array_sort (default comparator; body unused)."""

    func: str
    args: Tuple[Expr, ...]
    params: Tuple[str, ...] = ()
    body: Optional[Expr] = None

    def children(self):
        return self.args + ((self.body,) if self.body is not None else ())


# lambda-parameter type environment used while binding HOF bodies
_LAMBDA_TYPES: List[Dict[str, T.DataType]] = []


@_node
class HashFunc(Expr):
    """murmur3_hash(seed)/xxhash64(seed) — Spark-exact (reference:
    spark-expr/src/hash_funcs/{murmur3,xxhash64}.rs). Used by shuffle
    partitioning for row-level parity with the reference."""

    func: str
    args: Tuple[Expr, ...]
    seed: int = 42

    def children(self):
        return self.args


@_node
class RLike(Expr):
    """Regex match (Spark RLIKE / regexp_like; reference:
    spark-expr/src/predicate_funcs/rlike.rs). Pattern must be a literal —
    compiled to a DFA on the host, matched by a vectorized byte scan on
    device (exec/regex_dfa.py)."""

    child: Expr
    pattern: str
    negated: bool = False

    def children(self):
        return (self.child,)


@_node
class RegexpExtract(Expr):
    """Device regexp_extract for linear backtracking-free patterns
    (exec/regex_extract.py; reference:
    spark-expr/src/string_funcs/regexp_extract.rs). ir/functions.py only
    builds this node when the pattern linearizes — everything else keeps
    the host bridge."""

    child: Expr
    pattern: str
    group_idx: int = 1
    out_len: int = 0  # 0 = child width

    def children(self):
        return (self.child,)


@_node
class RegexpExtractAll(Expr):
    """Device regexp_extract_all for linear backtracking-free patterns that
    cannot match empty: every non-overlapping match's group as a
    LIST<STRING> (exec/regex_extract.py extract_all_device)."""

    child: Expr
    pattern: str
    group_idx: int = 1
    max_parts: int = 0  # 0 = DEFAULT_LIST_ELEMS
    out_len: int = 0    # element width; 0 = child width

    def children(self):
        return (self.child,)


@_node
class RegexpReplace(Expr):
    """Device regexp_replace for linear backtracking-free patterns with
    LITERAL replacements (no $group refs) that cannot match empty
    (exec/regex_extract.py replace_device; reference:
    spark-expr/src/string_funcs regexp_replace). ir/functions.py gates —
    everything else keeps the host bridge."""

    child: Expr
    pattern: str
    replacement: str
    out_len: int = 0  # 0 = child width

    def children(self):
        return (self.child,)


@_node
class Split(Expr):
    """Device split for LITERAL delimiters with Spark's default limit=-1
    (trailing empties kept) — exec/split_device.py; reference:
    spark-expr/src/string_funcs/split.rs. Regex patterns / other limits
    keep the host bridge (ir/functions.py gates at build time).
    Capacity contract: more than ``max_parts`` fields raises a
    QueryExecutionError naming the cap (the from_numpy overflow rule)."""

    child: Expr
    delim: str
    max_parts: int = 0  # 0 = DEFAULT_LIST_ELEMS

    def children(self):
        return (self.child,)


@_node
class SplitPart(Expr):
    """Device split_part(str, literal_delim, k): 1-based, negative from the
    end, k=0 ANSI error, out-of-range ''. exec/split_device.py."""

    child: Expr
    delim: str
    part: int = 1
    max_parts: int = 0

    def children(self):
        return (self.child,)


@_node
class FormatNumber(Expr):
    """Device format_number(v, d): HALF_EVEN round to d decimals +
    thousands grouping (exec/format_number.py). Wide (two-limb) decimals
    keep the host bridge (evaluator raises to the unsupported surface)."""

    child: Expr
    decimals: int = 0
    out_len: int = 32

    def children(self):
        return (self.child,)


@_node
class Soundex(Expr):
    """Device American Soundex (exec/split_device.py soundex_device);
    byte-exact with the host bridge for ASCII inputs, non-ASCII-leading
    rows pass through unchanged (docs/compatibility.md)."""

    child: Expr

    def children(self):
        return (self.child,)


@_node
class SubstringIndex(Expr):
    """Device substring_index(str, literal_delim, n). Negative n needs a
    1-byte delimiter on device (right-scan non-overlap of longer literals
    differs from the left scan); ir/functions.py keeps those on the host
    bridge. exec/split_device.py."""

    child: Expr
    delim: str
    count: int = 1
    max_parts: int = 0

    def children(self):
        return (self.child,)


@_node
class PythonUdf(Expr):
    """Scalar Python UDF evaluated on the HOST via jax.pure_callback — the
    analog of the reference's JVM-callback UDF bridge (reference:
    native/spark-expr/src/jvm_udf/mod.rs:38 JvmScalarUdfExpr, which calls
    back into the JVM per batch). fn(row_values...) -> python value; nulls
    are passed as None and a None result is a null."""

    fn: object  # Callable[..., Any], row-at-a-time
    args: Tuple[Expr, ...]
    out_dtype: T.DataType
    udf_name: str = "python_udf"
    # optional COLUMNAR host kernel: batch_fn(mask, *arg_cols) -> list of
    # cap results (None = null) or a ready ColumnVector. The bridge prefers
    # it over the row loop — the analog of the reference evaluating a whole
    # Arrow batch per JVM callback (comet_udf_bridge.rs:29) instead of a
    # value at a time. batch_mode "py" passes python value lists; "raw"
    # passes the argument ColumnVectors as host-numpy planes (no per-row
    # python materialization on the INPUT side either).
    batch_fn: object = None
    batch_mode: str = "py"

    def children(self):
        return self.args


@_node
class ArrayExpr(Expr):
    """Array functions over LIST columns (reference: spark-expr/src/array_funcs/).

    funcs: array (make), size, array_contains, array_position, element_at,
    get_array_item (0-based), array_min, array_max, sort_array, array_distinct,
    array_remove, array_append, array_prepend, array_repeat, arrays_overlap,
    slice, array_join, array_union, array_intersect, array_except,
    array_compact, array_reverse, flatten."""

    func: str
    args: Tuple[Expr, ...]

    def children(self):
        return self.args


@_node
class StructExpr(Expr):
    """struct/named_struct construction (reference: spark-expr/src/struct_funcs/)."""

    args: Tuple[Expr, ...]
    names: Tuple[str, ...]

    def children(self):
        return self.args


@_node
class GetStructField(Expr):
    """Extract one field of a STRUCT column (reference: struct_funcs
    GetStructField). ``field`` may be a name (str) or an ordinal (int)."""

    child: Expr
    field: object

    def children(self):
        return (self.child,)


@_node
class MapExpr(Expr):
    """Map functions over MAP columns — stored as entry lists normalized
    sorted by key (reference: spark-expr/src/map_funcs/ incl. map_sort).

    funcs: map (make from k1,v1,k2,v2,...), map_from_arrays, map_keys,
    map_values, map_entries, element_at, map_contains_key, size."""

    func: str
    args: Tuple[Expr, ...]

    def children(self):
        return self.args


@_node
class BloomMightContain(Expr):
    """Probe a Spark-compatible bloom filter (reference:
    spark-expr/src/bloom_filter/ BloomFilterMightContain +
    spark_bit_array.rs). ``filter`` must be host-resolvable at plan time
    (Literal bytes or ScalarSubquery over a bloom_filter aggregate) — the
    bit array becomes a device constant, the probe is k gathers per row."""

    filter: Expr
    child: Expr

    def children(self):
        return (self.filter, self.child)


@_node
class RandExpr(Expr):
    """rand()/randn() seeded per partition (reference:
    native/core/src/execution/expressions/random.rs — Spark XORShift)."""

    func: str
    seed: int


@_node
class MonotonicallyIncreasingId(Expr):
    pass


@_node
class SparkPartitionId(Expr):
    pass


@_node
class ScalarSubquery(Expr):
    """Placeholder materialized by the session before execution (reference:
    native/core/src/execution/expressions/subquery.rs:38 — value fetched
    lazily from the driver)."""

    subquery_id: int
    sub_dtype: T.DataType

    def __post_init__(self):
        object.__setattr__(self, "dtype", self.sub_dtype)


@dataclasses.dataclass(frozen=True)
class SortOrder:
    child: Expr
    ascending: bool = True
    nulls_first: Optional[bool] = None  # default: Spark = nulls first iff ascending

    def resolved_nulls_first(self) -> bool:
        return self.ascending if self.nulls_first is None else self.nulls_first


class AggFunc:
    SUM = "sum"
    COUNT = "count"
    MIN = "min"
    MAX = "max"
    AVG = "avg"
    FIRST = "first"
    LAST = "last"
    VAR_SAMP = "var_samp"
    VAR_POP = "var_pop"
    STDDEV_SAMP = "stddev_samp"
    STDDEV_POP = "stddev_pop"
    COVAR_SAMP = "covar_samp"
    COVAR_POP = "covar_pop"
    CORR = "corr"
    BIT_AND = "bit_and"
    BIT_OR = "bit_or"
    BIT_XOR = "bit_xor"
    BOOL_AND = "bool_and"
    BOOL_OR = "bool_or"
    COUNT_DISTINCT = "count_distinct"
    COLLECT_LIST = "collect_list"
    COLLECT_SET = "collect_set"
    PERCENTILE = "percentile"  # exact; extra[0] = percentage literal
    MEDIAN = "median"
    # QuantileSummaries contract (reference: agg_funcs/approx_percentile):
    # extra = (percentage literal, optional accuracy literal); returns an
    # actual data element at rank ceil(p*n) within the sketch's rank error
    APPROX_PERCENTILE = "approx_percentile"
    APPROX_COUNT_DISTINCT = "approx_count_distinct"  # HLL++
    BLOOM_FILTER = "bloom_filter"  # BloomFilterAgg (join pushdown)


@dataclasses.dataclass(frozen=True)
class AggExpr:
    """One aggregate: function + input + optional FILTER (WHERE) clause.

    Modes Partial/PartialMerge/Final follow the reference contract
    (operator.proto:480-484, planner.rs:1239-1375): Partial consumes input
    rows and emits state columns; PartialMerge/Final consume state columns
    starting at the group-key offset.
    """

    func: str
    child: Optional[Expr]  # None for COUNT(*)
    out_name: str
    filter: Optional[Expr] = None
    ignore_nulls: bool = True  # first/last
    extra: Tuple[Expr, ...] = ()  # second arg for covar/corr; percentage for percentile
    max_elems: int = 16  # collect_list/collect_set output capacity
    num_bits: int = 4096  # bloom_filter: filter size in bits (Spark numBits)

    def result_dtype(self) -> T.DataType:
        cd = self.child.dtype if self.child is not None else None
        f = self.func
        if f == AggFunc.COUNT or f == AggFunc.COUNT_DISTINCT:
            return T.INT64
        if f == AggFunc.SUM:
            assert cd is not None
            if cd.is_decimal:
                return T.decimal(min(cd.precision + 10, T.MAX_DECIMAL_PRECISION), cd.scale)
            if cd.is_integer:
                return T.INT64
            return T.FLOAT64
        if f == AggFunc.AVG:
            assert cd is not None
            if cd.is_decimal:
                # Spark: avg = decimal(p+4, s+4) bounded (DecimalType.bounded)
                return T.decimal(
                    min(cd.precision + 4, T.MAX_DECIMAL_PRECISION),
                    min(cd.scale + 4, T.MAX_DECIMAL_PRECISION),
                )
            return T.FLOAT64
        if f in (AggFunc.MIN, AggFunc.MAX, AggFunc.FIRST, AggFunc.LAST):
            assert cd is not None
            return cd
        if f in (AggFunc.BIT_AND, AggFunc.BIT_OR, AggFunc.BIT_XOR):
            assert cd is not None
            return cd
        if f in (AggFunc.BOOL_AND, AggFunc.BOOL_OR):
            return T.BOOL
        if f in (AggFunc.COLLECT_LIST, AggFunc.COLLECT_SET):
            assert cd is not None
            return T.list_(cd, self.max_elems)
        if f == AggFunc.APPROX_COUNT_DISTINCT:
            return T.INT64
        if f == AggFunc.BLOOM_FILTER:
            # Spark BloomFilterImpl.writeTo: 3 big-endian ints + longs
            return T.binary(12 + (self.num_bits // 64) * 8)
        if f == AggFunc.APPROX_PERCENTILE:
            # Spark returns an element of the input (same type)
            assert cd is not None
            return cd
        if f == AggFunc.PERCENTILE and self.extra and isinstance(self.extra[0], Literal) \
                and isinstance(self.extra[0].value, (list, tuple)):
            return T.list_(T.FLOAT64, len(self.extra[0].value))
        # variance/covariance family, percentile, median → double
        return T.FLOAT64


@dataclasses.dataclass(frozen=True)
class WindowFrame:
    """ROWS/RANGE frame (reference: operator.proto:552-603)."""

    frame_type: str = "rows"  # rows | range
    lower: Optional[int] = None  # None = UNBOUNDED PRECEDING
    upper: Optional[int] = 0  # 0 = CURRENT ROW; None = UNBOUNDED FOLLOWING


@dataclasses.dataclass(frozen=True)
class WindowExpr:
    """Window function spec (reference: CometWindowExec.scala:41-330)."""

    func: str  # row_number|rank|dense_rank|ntile|lag|lead|nth_value + agg names
    child: Optional[Expr]
    out_name: str
    partition_by: Tuple[Expr, ...] = ()
    order_by: Tuple[SortOrder, ...] = ()
    frame: WindowFrame = WindowFrame()
    offset: int = 1  # lag/lead
    default: Optional[Expr] = None  # lag/lead literal default


# -------------------------------------------------------------------------------------
# Builders
# -------------------------------------------------------------------------------------


def col(name: str) -> ColumnRef:
    return ColumnRef(name)


def if_(cond: Expr, then: Any, otherwise: Any = None) -> CaseWhen:
    """If(cond, then, else) — Spark's If is CaseWhen with one branch
    (reference: conditional_funcs/if_expr.rs)."""
    return CaseWhen(((cond, _e(then)),), _e(otherwise) if otherwise is not None else None)


def coalesce(*args: Any) -> CaseWhen:
    """COALESCE(a, b, ...) — first non-null argument."""
    exprs = [_e(a) for a in args]
    branches = tuple((UnaryOp("isnotnull", a), a) for a in exprs[:-1])
    return CaseWhen(branches, exprs[-1])


def nullif(a: Any, b: Any) -> CaseWhen:
    """NULLIF(a, b) — null when a == b else a."""
    ea, eb = _e(a), _e(b)
    return CaseWhen(((BinaryOp("eq", ea, eb), Literal(None, T.NULLTYPE)), ), ea)


def lit(value: Any, dtype: Optional[T.DataType] = None) -> Literal:
    if dtype is None:
        dtype = _infer_literal_type(value)
    if dtype.is_decimal and isinstance(value, float):
        value = round(value * 10**dtype.scale)
    elif dtype.is_decimal and isinstance(value, int) and dtype.scale:
        value = value * 10**dtype.scale
    return Literal(value, dtype)


def _infer_literal_type(v: Any) -> T.DataType:
    if v is None:
        return T.NULLTYPE
    if isinstance(v, bool):
        return T.BOOL
    if isinstance(v, int):
        return T.INT32 if -(2**31) <= v < 2**31 else T.INT64
    if isinstance(v, float):
        return T.FLOAT64
    if isinstance(v, str):
        return T.string(max(len(v.encode()), 1))
    if isinstance(v, bytes):
        return T.binary(max(len(v), 1))
    raise TypeError(f"cannot infer literal type for {v!r}")


# -------------------------------------------------------------------------------------
# Binding + type inference
# -------------------------------------------------------------------------------------

_CMP_OPS = {"eq", "ne", "lt", "le", "gt", "ge", "eqns"}
_LOGIC_OPS = {"and", "or"}
_ARITH_OPS = {"add", "sub", "mul", "div", "mod", "pmod"}
_BITWISE_OPS = {"band", "bor", "bxor", "shiftleft", "shiftright"}


def _decimal_arith_type(op: str, a: T.DataType, b: T.DataType) -> T.DataType:
    """Spark DecimalPrecision rules + adjustPrecisionScale (precision-loss
    allowed, Spark default). Reference parity: QueryPlanSerde arithmetic serde
    + spark-expr decimal kernels."""
    p1, s1, p2, s2 = a.precision, a.scale, b.precision, b.scale
    if op in ("add", "sub"):
        s = max(s1, s2)
        p = max(p1 - s1, p2 - s2) + s + 1
    elif op == "mul":
        p, s = p1 + p2 + 1, s1 + s2
    elif op == "div":
        s = max(6, s1 + p2 + 1)
        p = p1 - s1 + s2 + s
    elif op in ("mod", "pmod"):
        s = max(s1, s2)
        p = min(p1 - s1, p2 - s2) + s
    else:
        raise ValueError(op)
    return _adjust_precision_scale(p, s)


def _adjust_precision_scale(p: int, s: int) -> T.DataType:
    MAXP = T.MAX_DECIMAL_PRECISION
    if p <= MAXP:
        return T.decimal(p, s)
    int_digits = p - s
    min_scale = min(s, 6)
    adjusted = max(MAXP - int_digits, min_scale)
    return T.decimal(MAXP, adjusted)


def _to_decimal_if_int(t: T.DataType) -> T.DataType:
    if t.is_integer:
        return {
            "INT8": T.decimal(3, 0),
            "INT16": T.decimal(5, 0),
            "INT32": T.decimal(10, 0),
            "INT64": T.decimal(20, 0),
        }[t.type_id]
    return t


def bind(expr: Expr, schema: T.Schema) -> Expr:
    """Resolve column refs against ``schema`` and compute result dtypes.

    Returns a new tree of bound nodes (original is untouched)."""
    return _bind(expr, schema)


def _bind(e: Expr, schema: T.Schema) -> Expr:
    if isinstance(e, BoundRef) or isinstance(e, Literal) or isinstance(e, ScalarSubquery):
        return e
    if isinstance(e, ColumnRef):
        i = schema.index_of(e.col_name)
        return BoundRef(i, e.col_name, schema.fields[i].dtype)
    if isinstance(e, Alias):
        c = _bind(e.child, schema)
        out = Alias(c, e.out_name)
        object.__setattr__(out, "dtype", c.dtype)
        return out
    if isinstance(e, BinaryOp):
        l, r = _bind(e.left, schema), _bind(e.right, schema)
        out = BinaryOp(e.op, l, r, e.eval_mode)
        object.__setattr__(out, "dtype", _binary_result_type(e.op, l, r))
        return out
    if isinstance(e, UnaryOp):
        c = _bind(e.child, schema)
        if e.op in ("isnull", "isnotnull", "not", "isnan"):
            dt = T.BOOL
        elif e.op in ("negate", "abs"):
            dt = c.dtype
        else:
            raise NotImplementedError(e.op)
        out = UnaryOp(e.op, c, e.eval_mode)
        object.__setattr__(out, "dtype", dt)
        return out
    if isinstance(e, Cast):
        c = _bind(e.child, schema)
        out = Cast(c, e.to, e.eval_mode, e.timezone)
        object.__setattr__(out, "dtype", e.to)
        return out
    if isinstance(e, CaseWhen):
        branches = tuple((_bind(c, schema), _bind(v, schema)) for c, v in e.branches)
        else_v = _bind(e.else_value, schema) if e.else_value is not None else None
        dt = branches[0][1].dtype
        for _, v in branches[1:]:
            dt = T.common_type(dt, v.dtype)
        if else_v is not None:
            dt = T.common_type(dt, else_v.dtype)
        out = CaseWhen(branches, else_v)
        object.__setattr__(out, "dtype", dt)
        return out
    if isinstance(e, InList):
        c = _bind(e.child, schema)
        vals = tuple(_bind(v, schema) for v in e.values)
        out = InList(c, vals, e.negated)
        object.__setattr__(out, "dtype", T.BOOL)
        return out
    if isinstance(e, Like):
        c = _bind(e.child, schema)
        out = Like(c, e.pattern, e.negated)
        object.__setattr__(out, "dtype", T.BOOL)
        return out
    if isinstance(e, StringFunc):
        args = tuple(_bind(a, schema) for a in e.args)
        out = StringFunc(e.func, args)
        object.__setattr__(out, "dtype", _string_func_type(e.func, args))
        return out
    if isinstance(e, TemporalFunc):
        args = tuple(_bind(a, schema) for a in e.args)
        dt = {
            "year": T.INT32,
            "month": T.INT32,
            "day": T.INT32,
            "quarter": T.INT32,
            "dayofweek": T.INT32,
            "dayofyear": T.INT32,
            "weekofyear": T.INT32,
            "hour": T.INT32,
            "minute": T.INT32,
            "second": T.INT32,
            "unix_date": T.INT32,
            "weekday": T.INT32,
            "unix_seconds": T.INT64,
            "timestampadd": T.TIMESTAMP,
            "timestampdiff": T.INT64,
            "convert_timezone": T.TIMESTAMP_NTZ,
            "date_add": T.DATE,
            "date_sub": T.DATE,
            "last_day": T.DATE,
            "trunc_date": T.DATE,
            "datediff": T.INT32,
            "from_utc_timestamp": T.TIMESTAMP_NTZ,
            "to_utc_timestamp": T.TIMESTAMP,
            "date_trunc": T.TIMESTAMP,
            "unix_timestamp": T.INT64,
            "unix_micros": T.INT64,
            "unix_millis": T.INT64,
            "timestamp_seconds": T.TIMESTAMP,
            "timestamp_millis": T.TIMESTAMP,
            "timestamp_micros": T.TIMESTAMP,
            "add_months": T.DATE,
            "next_day": T.DATE,
            "make_date": T.DATE,
            "months_between": T.FLOAT64,
            "from_unixtime": T.string(19),
        }[e.func]
        out = TemporalFunc(e.func, args, e.tz, e.unit)
        object.__setattr__(out, "dtype", dt)
        return out
    if isinstance(e, MathFunc):
        args = tuple(_bind(a, schema) for a in e.args)
        if e.func in ("round", "bround"):
            child = args[0]
            if child.dtype.is_decimal:
                # Spark round(decimal(p,s), d): result decimal(p-s+d+1... keep (p, d) bounded
                d = args[1].value if len(args) > 1 else 0
                dt = _adjust_precision_scale(child.dtype.precision - child.dtype.scale + max(d, 0) + 1, max(d, 0))
            else:
                dt = child.dtype
        elif e.func in ("floor", "ceil"):
            child = args[0]
            if child.dtype.is_decimal:
                dt = _adjust_precision_scale(child.dtype.precision - child.dtype.scale + 1, 0)
            elif child.dtype.is_integer:
                dt = child.dtype
            else:
                dt = T.INT64
        elif e.func in ("sign",):
            dt = T.FLOAT64
        elif e.func == "width_bucket":
            dt = T.INT64
        elif e.func == "factorial":
            dt = T.INT64
        elif e.func == "bit_count":
            dt = T.INT32
        elif e.func == "getbit":
            dt = T.INT8
        elif e.func == "shiftrightunsigned":
            dt = args[0].dtype if args[0].dtype.is_integer else T.INT64
        elif e.func in ("greatest", "least"):
            dt = args[0].dtype
            for a in args[1:]:
                dt = T.common_type(dt, a.dtype)
        else:
            dt = T.FLOAT64
        out = MathFunc(e.func, args, e.eval_mode)
        object.__setattr__(out, "dtype", dt)
        return out
    if isinstance(e, LambdaVar):
        for env in reversed(_LAMBDA_TYPES):
            if e.var_name in env:
                out = LambdaVar(e.var_name)
                object.__setattr__(out, "dtype", env[e.var_name])
                return out
        raise KeyError(f"lambda variable {e.var_name!r} not in scope")
    if isinstance(e, HigherOrderFunc):
        args = tuple(_bind(a, schema) for a in e.args)
        arr = args[0]
        f = e.func
        if f in ("transform_keys", "transform_values", "map_filter"):
            assert arr.dtype.is_map, f"{f} needs a map input"
            kt, vt = arr.dtype.key_type, arr.dtype.value_type
            _LAMBDA_TYPES.append(dict(zip(e.params, (kt, vt))))
            try:
                body = _bind(e.body, schema)
            finally:
                _LAMBDA_TYPES.pop()
            dt = {
                "transform_keys": T.map_(body.dtype, vt, arr.dtype.max_elems),
                "transform_values": T.map_(kt, body.dtype, arr.dtype.max_elems),
                "map_filter": arr.dtype,
            }[f]
            out = HigherOrderFunc(f, args, e.params, body)
            object.__setattr__(out, "dtype", dt)
            return out
        assert arr.dtype.is_list, f"{e.func} needs an array input"
        elem_t = arr.dtype.element
        if f == "zip_with":
            assert args[1].dtype.is_list
            ptypes = (elem_t, args[1].dtype.element)
        elif f == "aggregate":
            ptypes = (args[1].dtype, elem_t)  # (acc, x); init = args[1]
        elif f == "array_sort":
            ptypes = ()
        else:  # transform/filter/exists/forall: (x) or (x, index)
            ptypes = (elem_t, T.INT32)[: max(len(e.params), 1)]
        body = None
        if e.body is not None:
            _LAMBDA_TYPES.append(dict(zip(e.params, ptypes)))
            try:
                body = _bind(e.body, schema)
            finally:
                _LAMBDA_TYPES.pop()
        ne = max(arr.dtype.max_elems,
                 args[1].dtype.max_elems if f == "zip_with" else 0)
        dt = {
            "transform": T.list_(body.dtype, ne) if body is not None else arr.dtype,
            "filter": arr.dtype,
            "exists": T.BOOL,
            "forall": T.BOOL,
            "aggregate": body.dtype if body is not None else elem_t,
            "zip_with": T.list_(body.dtype, ne) if body is not None else arr.dtype,
            "array_sort": arr.dtype,
        }[f]
        out = HigherOrderFunc(f, args, e.params, body)
        object.__setattr__(out, "dtype", dt)
        return out
    if isinstance(e, HashFunc):
        args = tuple(_bind(a, schema) for a in e.args)
        out = HashFunc(e.func, args, e.seed)
        object.__setattr__(out, "dtype", T.INT32 if e.func == "murmur3" else T.INT64)
        return out
    if isinstance(e, BloomMightContain):
        flt = _bind(e.filter, schema)
        c = _bind(e.child, schema)
        out = BloomMightContain(flt, c)
        object.__setattr__(out, "dtype", T.BOOL)
        return out
    if isinstance(e, RLike):
        c = _bind(e.child, schema)
        out = RLike(c, e.pattern, e.negated)
        object.__setattr__(out, "dtype", T.BOOL)
        return out
    if isinstance(e, RegexpExtract):
        c = _bind(e.child, schema)
        out = RegexpExtract(c, e.pattern, e.group_idx, e.out_len)
        width = e.out_len or (c.dtype.byte_width if c.dtype.is_binary
                              else T.DEFAULT_STRING_LEN)
        object.__setattr__(out, "dtype", T.string(width))
        return out
    if isinstance(e, RegexpExtractAll):
        c = _bind(e.child, schema)
        out = RegexpExtractAll(c, e.pattern, e.group_idx, e.max_parts,
                               e.out_len)
        width = e.out_len or (c.dtype.byte_width if c.dtype.is_binary
                              else T.DEFAULT_STRING_LEN)
        parts = e.max_parts or T.DEFAULT_LIST_ELEMS
        object.__setattr__(out, "dtype", T.list_(T.string(width), parts))
        return out
    if isinstance(e, RegexpReplace):
        c = _bind(e.child, schema)
        out = RegexpReplace(c, e.pattern, e.replacement, e.out_len)
        width = e.out_len
        if not width:
            w = (c.dtype.byte_width if c.dtype.is_binary
                 else T.DEFAULT_STRING_LEN)
            # growth bound: every min-length match may expand to the
            # replacement's length
            from datafusion_comet_tpu.exec.regex_extract import (
                linearize, min_match_len)

            lp = linearize(e.pattern, 0)
            R = len(e.replacement.encode("utf-8"))
            mn = min_match_len(lp) if lp is not None else 1
            factor = -(-R // max(mn, 1)) if R > mn else 1
            width = min(w * max(factor, 1), 4096)
        object.__setattr__(out, "dtype", T.string(width))
        return out
    if isinstance(e, Split):
        c = _bind(e.child, schema)
        out = Split(c, e.delim, e.max_parts)
        width = c.dtype.byte_width if c.dtype.is_binary else T.DEFAULT_STRING_LEN
        parts = e.max_parts or T.DEFAULT_LIST_ELEMS
        object.__setattr__(out, "dtype", T.list_(T.string(width), parts))
        return out
    if isinstance(e, (SplitPart, SubstringIndex)):
        c = _bind(e.child, schema)
        third = e.part if isinstance(e, SplitPart) else e.count
        out = type(e)(c, e.delim, third, e.max_parts)
        width = c.dtype.byte_width if c.dtype.is_binary else T.DEFAULT_STRING_LEN
        object.__setattr__(out, "dtype", T.string(width))
        return out
    if isinstance(e, Soundex):
        c = _bind(e.child, schema)
        out = Soundex(c)
        width = c.dtype.byte_width if c.dtype.is_binary else T.DEFAULT_STRING_LEN
        object.__setattr__(out, "dtype", T.string(max(width, 4)))
        return out
    if isinstance(e, FormatNumber):
        c = _bind(e.child, schema)
        out = FormatNumber(c, e.decimals, e.out_len)
        object.__setattr__(out, "dtype", T.string(e.out_len or 32))
        return out
    if isinstance(e, PythonUdf):
        args = tuple(_bind(a, schema) for a in e.args)
        out = PythonUdf(e.fn, args, e.out_dtype, e.udf_name)
        object.__setattr__(out, "dtype", e.out_dtype)
        return out
    if isinstance(e, ArrayExpr):
        args = tuple(_bind(a, schema) for a in e.args)
        out = ArrayExpr(e.func, args)
        object.__setattr__(out, "dtype", _array_func_type(e.func, args))
        return out
    if isinstance(e, StructExpr):
        args = tuple(_bind(a, schema) for a in e.args)
        names = e.names or tuple(f"col{i+1}" for i in range(len(args)))
        out = StructExpr(args, names)
        object.__setattr__(
            out, "dtype", T.struct(*[(n, a.dtype) for n, a in zip(names, args)])
        )
        return out
    if isinstance(e, GetStructField):
        c = _bind(e.child, schema)
        st = c.dtype
        assert st is not None and st.is_struct, f"get_struct_field on {st!r}"
        if isinstance(e.field, str):
            idx = next(i for i, f in enumerate(st.struct_fields) if f.name == e.field)
        else:
            idx = int(e.field)
        out = GetStructField(c, idx)
        object.__setattr__(out, "dtype", st.struct_fields[idx].dtype)
        return out
    if isinstance(e, MapExpr):
        args = tuple(_bind(a, schema) for a in e.args)
        out = MapExpr(e.func, args)
        object.__setattr__(out, "dtype", _map_func_type(e.func, args))
        return out
    if isinstance(e, RandExpr):
        out = RandExpr(e.func, e.seed)
        object.__setattr__(out, "dtype", T.FLOAT64)
        return out
    if isinstance(e, MonotonicallyIncreasingId):
        out = MonotonicallyIncreasingId()
        object.__setattr__(out, "dtype", T.INT64)
        return out
    if isinstance(e, SparkPartitionId):
        out = SparkPartitionId()
        object.__setattr__(out, "dtype", T.INT32)
        return out
    raise NotImplementedError(f"bind: {type(e).__name__}")


def _binary_result_type(op: str, l: Expr, r: Expr) -> T.DataType:
    lt, rt = l.dtype, r.dtype
    assert lt is not None and rt is not None
    if op in _CMP_OPS or op in _LOGIC_OPS:
        return T.BOOL
    if op in _BITWISE_OPS:
        return T.common_type(lt, rt) if op in ("band", "bor", "bxor") else lt
    if op in _ARITH_OPS:
        if lt.is_decimal or rt.is_decimal:
            return _decimal_arith_type(op, _to_decimal_if_int(lt), _to_decimal_if_int(rt))
        if op == "div" and lt.is_integer and rt.is_integer:
            # Spark '/' on integers yields double
            return T.FLOAT64
        return T.common_type(lt, rt)
    raise NotImplementedError(op)


def _array_func_type(func: str, args: Sequence[Expr]) -> T.DataType:
    a0 = args[0].dtype if args else None
    if func == "array":
        ct = args[0].dtype
        for a in args[1:]:
            ct = T.common_type(ct, a.dtype)
        return T.list_(ct, max(len(args), 1))
    if func == "size":
        return T.INT32
    if func in ("array_contains", "arrays_overlap"):
        return T.BOOL
    if func == "array_position":
        return T.INT64
    if func in ("element_at", "get_array_item", "array_min", "array_max"):
        assert a0 is not None and a0.is_list
        return a0.element
    if func in ("sort_array", "array_distinct", "array_remove", "array_compact",
                "array_reverse", "slice"):
        assert a0 is not None and a0.is_list
        return a0
    if func in ("array_append", "array_prepend"):
        return T.list_(a0.element, a0.max_elems + 1)
    if func == "array_insert":
        return T.list_(a0.element, a0.max_elems + 1)
    if func == "arrays_zip":
        els = []
        n = 0
        for i, a in enumerate(args):
            assert a.dtype.is_list
            els.append((str(i), a.dtype.element))
            n = max(n, a.dtype.max_elems)
        return T.list_(T.struct(*els), n)
    if func == "get_array_struct_field":
        assert a0 is not None and a0.is_list and a0.element.is_struct
        idx = int(args[1].value)
        return T.list_(a0.element.struct_fields[idx].dtype, a0.max_elems)
    if func == "array_repeat":
        n = args[1]
        count = n.value if isinstance(n, Literal) else T.DEFAULT_LIST_ELEMS
        return T.list_(args[0].dtype, max(int(count), 1))
    if func == "array_union":
        b = args[1].dtype
        return T.list_(T.common_type(a0.element, b.element), a0.max_elems + b.max_elems)
    if func == "array_intersect":
        b = args[1].dtype
        return T.list_(a0.element, min(a0.max_elems, b.max_elems))
    if func == "array_except":
        return a0
    if func == "array_join":
        assert a0 is not None and a0.is_list and a0.element.is_string
        sep_w = args[1].dtype.byte_width if args[1].dtype.is_binary else 4
        return T.string(a0.max_elems * (a0.element.byte_width + sep_w))
    if func == "flatten":
        assert a0 is not None and a0.is_list and a0.element.is_list
        return T.list_(a0.element.element, a0.max_elems * a0.element.max_elems)
    raise NotImplementedError(f"array func {func}")


def _map_func_type(func: str, args: Sequence[Expr]) -> T.DataType:
    a0 = args[0].dtype if args else None
    if func == "map":
        kt = args[0].dtype
        vt = args[1].dtype
        for i in range(2, len(args), 2):
            kt = T.common_type(kt, args[i].dtype)
            vt = T.common_type(vt, args[i + 1].dtype)
        return T.map_(kt, vt, max(len(args) // 2, 1))
    if func == "map_from_arrays":
        ka, va = args[0].dtype, args[1].dtype
        assert ka.is_list and va.is_list
        return T.map_(ka.element, va.element, ka.max_elems)
    if func == "map_keys":
        assert a0 is not None and a0.is_map
        return T.list_(a0.key_type, a0.max_elems)
    if func == "map_values":
        assert a0 is not None and a0.is_map
        return T.list_(a0.value_type, a0.max_elems)
    if func == "map_entries":
        assert a0 is not None and a0.is_map
        return T.list_(a0.element, a0.max_elems)
    if func == "map_concat":
        assert a0 is not None and a0.is_map
        kt, vt = a0.key_type, a0.value_type
        total = 0
        for a in args:
            assert a.dtype.is_map
            kt = T.common_type(kt, a.dtype.key_type)
            vt = T.common_type(vt, a.dtype.value_type)
            total += a.dtype.max_elems
        return T.map_(kt, vt, total)
    if func == "map_from_entries":
        assert a0 is not None and a0.is_list and a0.element.is_struct
        fs = a0.element.struct_fields
        return T.map_(fs[0].dtype, fs[1].dtype, a0.max_elems)
    if func == "element_at":
        assert a0 is not None and a0.is_map
        return a0.value_type
    if func == "map_contains_key":
        return T.BOOL
    if func == "size":
        return T.INT32
    raise NotImplementedError(f"map func {func}")


def _string_func_type(func: str, args: Sequence[Expr]) -> T.DataType:
    a0 = args[0].dtype if args else None
    if func in ("length", "ascii", "instr", "locate", "char_length", "bit_length", "octet_length", "levenshtein", "json_array_length"):
        return T.INT32
    if func in ("substring", "upper", "lower", "trim", "ltrim", "rtrim", "reverse", "replace", "translate", "initcap"):
        assert a0 is not None
        return a0
    if func in ("startswith", "endswith", "contains"):
        return T.BOOL
    if func in ("concat", "concat_ws"):
        width = sum(a.dtype.byte_width for a in args if a.dtype is not None and a.dtype.is_binary)
        return T.string(max(width, 1))
    if func in ("lpad", "rpad", "repeat"):
        return T.string(a0.byte_width * 4 if a0 else T.DEFAULT_STRING_LEN)
    if func in ("left", "right", "btrim"):
        assert a0 is not None
        return a0
    if func == "chr":
        return T.string(1)
    if func == "space":
        n = args[0]
        cap = int(n.value) if isinstance(n, Literal) and n.value is not None else 64
        return T.string(max(min(cap, 1 << 15), 1))
    # binary/encoding family (exec/bytes_funcs.py; reference
    # math_funcs/unhex.rs, string_funcs/base64.rs)
    if func == "hex":
        if a0 is not None and a0.is_binary:
            return T.string(2 * a0.byte_width)
        return T.string(16)
    if func == "unhex":
        w = a0.byte_width if a0 is not None and a0.is_binary else T.DEFAULT_STRING_LEN
        return T.binary(max((w + 1) // 2, 1))
    if func == "base64":
        w = a0.byte_width if a0 is not None and a0.is_binary else T.DEFAULT_STRING_LEN
        enc = (w + 2) // 3 * 4
        return T.string(max(enc + 2 * max((enc - 1) // 76, 0), 4))
    if func == "unbase64":
        w = a0.byte_width if a0 is not None and a0.is_binary else T.DEFAULT_STRING_LEN
        return T.binary(max(w // 4 * 3 + 3, 3))
    if func == "encode":
        assert a0 is not None
        return T.binary(a0.byte_width)
    if func == "decode":
        assert a0 is not None
        return T.string(a0.byte_width)
    if func == "get_json_object":
        # a matched value span cannot exceed the source document
        assert a0 is not None and a0.is_binary
        return T.string(a0.byte_width)
    if func == "bin":
        return T.string(64)
    if func == "conv":
        return T.string(65)
    if func == "md5":
        return T.string(32)
    if func == "sha1":
        return T.string(40)
    if func == "sha2":
        bits = args[1]
        b = int(bits.value) if isinstance(bits, Literal) and bits.value is not None else 256
        return T.string({0: 64, 224: 56, 256: 64, 384: 96, 512: 128}.get(b, 64))
    if func == "crc32":
        return T.INT64
    raise NotImplementedError(f"string func {func}")
