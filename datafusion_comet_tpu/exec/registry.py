"""Pluggable operator/expression registries with per-node config gates.

Reference surface: the reference planner resolves every operator through a
builder registry keyed by the proto operator type so new operators register
without editing a dispatch chain
(native/core/src/execution/planner/operator_registry.rs:32), and CometConf
generates a ``spark.comet.exec.<operator>.enabled`` /
``spark.comet.expression.<Expr>.enabled`` toggle for every supported node
(spark/src/main/scala/org/apache/comet/CometConf.scala:209-243).

Here the same two ideas are one module:

- ``OPERATORS`` maps a plan-node class to its executor. The engine's
  dispatch is a registry lookup; extensions call
  ``OPERATORS.register(MyNode)`` with an executor of signature
  ``(plan, tables, ctx, flags, fanout, metrics, rec) -> Batch`` where
  ``rec(child)`` recursively executes a child plan.
- Every registration (and every expression node / function name declared
  in ``_EXPR_FUNCS``) auto-creates a boolean config gate. A disabled node
  makes the whole plan unsupported — this engine has no second runtime to
  fall back to, so the gate surfaces as an ``UnsupportedPlanError`` whose
  reasons use the same strings ``Session.validate()`` reports (the
  withFallbackReason analog, CometSparkSessionExtensions.scala:301).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple, Type

from datafusion_comet_tpu import conf as C
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = [
    "OPERATORS",
    "OperatorRegistry",
    "UnsupportedPlanError",
    "expression_gate_key",
    "gate_reasons",
]


class UnsupportedPlanError(NotImplementedError):
    """A plan cannot execute: unregistered/disabled operator or expression.

    ``reasons`` carries the per-node explanations (the fallback-reason
    strings the reference attaches to the Spark plan when it cannot
    convert a node). Subclasses NotImplementedError so callers that guard
    unsupported paths with the deep evaluator's exception keep working."""

    def __init__(self, reasons: List[str]):
        super().__init__("; ".join(reasons))
        self.reasons = list(reasons)


ExecFn = Callable[..., Any]


class OperatorRegistry:
    """Plan-node class -> executor, each with an auto-generated config gate."""

    def __init__(self) -> None:
        self._handlers: Dict[Type[P.PlanNode], ExecFn] = {}
        self._gates: Dict[Type[P.PlanNode], C.ConfigEntry] = {}

    def register(self, node_type: Type[P.PlanNode], name: Optional[str] = None,
                 gated: bool = True) -> Callable[[ExecFn], ExecFn]:
        op = name or node_type.__name__

        def deco(fn: ExecFn) -> ExecFn:
            self._handlers[node_type] = fn
            if gated:
                self._gates[node_type] = C.register_entry(
                    f"comet.exec.operator.{op}.enabled", True, "exec",
                    f"Enable the {op} operator; disabling makes plans "
                    "containing it unsupported "
                    "(spark.comet.exec.<op>.enabled analog).",
                )
            return fn

        return deco

    def resolve(self, node_type: Type[P.PlanNode]) -> ExecFn:
        fn = self._handlers.get(node_type)
        if fn is None:
            # walk the MRO so subclasses of registered nodes inherit the
            # executor (e.g. a user node specializing Projection)
            for base in node_type.__mro__[1:]:
                fn = self._handlers.get(base)
                if fn is not None:
                    return fn
            raise UnsupportedPlanError(
                [f"operator {node_type.__name__}: no registered executor"])
        return fn

    def gate(self, node_type: Type[P.PlanNode]) -> Optional[C.ConfigEntry]:
        return self._gates.get(node_type)

    def registered(self) -> Tuple[Type[P.PlanNode], ...]:
        return tuple(self._handlers)


OPERATORS = OperatorRegistry()


# -------------------------------------------------------------------------------------
# expression gates
# -------------------------------------------------------------------------------------

# function-style expression nodes carry their variant in a `func` field;
# each variant gets its own gate (the reference generates one toggle per
# Spark expression class — here per kernel the evaluator dispatches on)
_FUNC_NODE_TYPES = (E.StringFunc, E.TemporalFunc, E.MathFunc, E.HashFunc)

_EXPR_GATES: Dict[str, C.ConfigEntry] = {}


def expression_gate_key(e: Any) -> Optional[str]:
    """The gate name for a bound expression node (None = ungated core node:
    column refs, literals, aliases)."""
    if isinstance(e, _FUNC_NODE_TYPES):
        return e.func
    if isinstance(e, (E.BoundRef, E.Literal, E.Alias, E.ColumnRef)):
        return None
    if isinstance(e, E.BinaryOp) or isinstance(e, E.UnaryOp):
        return e.op
    return type(e).__name__


def _ensure_expr_gate(name: str) -> C.ConfigEntry:
    g = _EXPR_GATES.get(name)
    if g is None:
        g = C.register_entry(
            f"comet.expr.{name}.enabled", True, "expr",
            f"Enable the {name} expression kernel; disabling makes plans "
            "using it unsupported (spark.comet.expression.<Expr>.enabled "
            "analog).",
        )
        _EXPR_GATES[name] = g
    return g


def _register_known_expression_gates() -> None:
    """Pre-create gates for the full shipped expression surface so
    ``generate_docs()`` lists them without needing a plan walk first."""
    for name in (
        # structural nodes
        "Cast", "CaseWhen", "InList", "Like", "RLike", "ArrayExpr",
        "StructExpr", "GetStructField", "MapExpr", "BloomMightContain",
        "RandExpr", "MonotonicallyIncreasingId", "SparkPartitionId",
        "PythonUdf", "ScalarSubquery",
        # binary/unary ops
        "add", "sub", "mul", "div", "mod", "pmod", "and", "or", "eq", "ne",
        "eqns", "lt", "le", "gt", "ge", "band", "bor", "bxor", "shiftleft",
        "shiftright", "not", "negate", "isnull", "isnotnull", "isnan", "abs",
        # string funcs
        "substring", "upper", "lower", "length", "concat", "trim", "ltrim",
        "rtrim", "startswith", "endswith", "contains", "replace", "lpad",
        "rpad", "ascii", "instr", "repeat", "reverse", "split_part",
        "concat_ws", "translate", "initcap", "octet_length", "bit_length",
        "hex", "unhex", "base64", "unbase64", "encode", "decode", "bin",
        "conv", "md5", "sha1", "sha2", "crc32", "get_json_object",
        # temporal funcs
        "year", "month", "day", "quarter", "dayofweek", "dayofyear", "hour",
        "minute", "second", "date_add", "date_sub", "datediff", "trunc_date",
        "last_day", "unix_date", "from_utc_timestamp", "to_utc_timestamp",
        "date_trunc", "unix_timestamp", "timestamp_seconds",
        "timestamp_millis", "timestamp_micros", "unix_micros", "unix_millis",
        "add_months", "months_between", "next_day", "make_date",
        "from_unixtime",
        # math funcs
        "round", "floor", "ceil", "sqrt", "exp", "ln", "log10", "log2",
        "pow", "sin", "cos", "tan", "atan", "atan2", "sign", "greatest",
        "least",
        # hash funcs
        "murmur3_hash", "xxhash64",
    ):
        _ensure_expr_gate(name)


_register_known_expression_gates()


# -------------------------------------------------------------------------------------
# plan walking + gate checks
# -------------------------------------------------------------------------------------


def _iter_exprs(value: Any):
    """Yield every Expr reachable from a plan-node field value (tuples,
    AggExpr/WindowExpr/SortOrder wrappers, nested expr children)."""
    if isinstance(value, E.Expr):
        yield value
        for c in value.children():
            yield from _iter_exprs(c)
    elif isinstance(value, (E.AggExpr, E.WindowExpr, E.SortOrder)):
        for f in dataclasses.fields(value):
            yield from _iter_exprs(getattr(value, f.name))
    elif isinstance(value, (tuple, list)):
        for v in value:
            yield from _iter_exprs(v)


def _node_exprs(plan: P.PlanNode):
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name)
        if isinstance(v, P.PlanNode) or (
            isinstance(v, (tuple, list)) and v and isinstance(v[0], P.PlanNode)
        ):
            continue  # children handled by the plan walk
        yield from _iter_exprs(v)


def gate_reasons(plan: P.PlanNode, conf: Optional[C.Config] = None) -> List[str]:
    """Fallback reasons for disabled operators/expressions anywhere in the
    plan (empty = fully enabled). Mirrors the strings validate() reports."""
    conf = conf or C.CONF
    reasons: List[str] = []
    seen_ops = set()
    seen_exprs = set()

    def walk(p: P.PlanNode) -> None:
        t = type(p)
        if t not in seen_ops:
            seen_ops.add(t)
            g = OPERATORS.gate(t)
            if g is not None and not conf.get(g):
                reasons.append(f"operator {t.__name__} disabled by {g.key}")
        for e in _node_exprs(p):
            key = expression_gate_key(e)
            if key and key not in seen_exprs:
                seen_exprs.add(key)
                g = _EXPR_GATES.get(key)
                if g is not None and not conf.get(g):
                    reasons.append(f"expression {key} disabled by {g.key}")
            if isinstance(e, E.Cast) and not conf.get(C.CAST_ALLOW_INCOMPATIBLE):
                frm = e.child.dtype
                if frm is not None and e.to is not None:
                    from datafusion_comet_tpu.exec.cast_matrix import support_for_types

                    lvl, note = support_for_types(frm, e.to)
                    pair = f"cast {frm.type_id}->{e.to.type_id}"
                    if lvl == "incompatible" and pair not in seen_exprs:
                        seen_exprs.add(pair)
                        reasons.append(
                            f"{pair} is Incompatible ({note}); set "
                            f"{C.CAST_ALLOW_INCOMPATIBLE.key}=true to allow")
        for c in p.children():
            walk(c)

    walk(plan)
    return reasons
