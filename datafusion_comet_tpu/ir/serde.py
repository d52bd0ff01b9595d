"""Plan/expression serde: versioned JSON wire format for the IR.

The analog of the reference's protobuf plan IR — its best architectural
decision (SURVEY.md §7: "versioned, testable, engine-agnostic"; reference:
native/proto/src/proto/{operator,expr,partitioning,types}.proto produced by
QueryPlanSerde and consumed by PhysicalPlanner). Here the driver and engine
share a process, but the serialized form still matters: plan caching keyed
by bytes, driver→executor shipping in multi-host deployments, golden
plan-stability tests (CometPlanStabilitySuite pattern), and debugging.

Format: ``{"version": 1, "plan": <node>}`` where every node/expr is
``{"_k": <class-name>, ...fields}``; DataTypes serialize structurally
(nested element/struct fields recurse). Unbound trees only — binding is the
consumer's job, exactly like the reference re-plans proto on the native side
(planner.rs:1202 create_plan).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["plan_to_json", "plan_from_json", "expr_to_dict", "expr_from_dict"]

VERSION = 1

_EXPR_CLASSES = {
    cls.__name__: cls
    for cls in vars(E).values()
    if isinstance(cls, type) and issubclass(cls, E.Expr)
}
_PLAN_CLASSES = {
    cls.__name__: cls
    for cls in vars(P).values()
    if isinstance(cls, type) and issubclass(cls, P.PlanNode)
}


def _dtype_to_dict(dt: T.DataType) -> Dict[str, Any]:
    out: Dict[str, Any] = {"id": dt.type_id}
    if dt.is_decimal:
        out["precision"] = dt.precision
        out["scale"] = dt.scale
    if dt.is_binary:
        out["max_len"] = dt.max_len
    if dt.tz:
        out["tz"] = dt.tz
    if dt.element is not None:
        out["element"] = _dtype_to_dict(dt.element)
        out["max_elems"] = dt.max_elems
    if dt.struct_fields:
        out["fields"] = [
            {"name": f.name, "dtype": _dtype_to_dict(f.dtype), "nullable": f.nullable}
            for f in dt.struct_fields
        ]
    return out


def _dtype_from_dict(d: Dict[str, Any]) -> T.DataType:
    fields = tuple(
        T.Field(f["name"], _dtype_from_dict(f["dtype"]), f.get("nullable", True))
        for f in d.get("fields", [])
    )
    return T.DataType(
        d["id"],
        precision=d.get("precision", 0),
        scale=d.get("scale", 0),
        max_len=d.get("max_len", 0),
        tz=d.get("tz"),
        element=_dtype_from_dict(d["element"]) if "element" in d else None,
        max_elems=d.get("max_elems", 0),
        struct_fields=fields,
    )


def _schema_to_dict(s: T.Schema):
    return [
        {"name": f.name, "dtype": _dtype_to_dict(f.dtype), "nullable": f.nullable}
        for f in s.fields
    ]


def _schema_from_dict(d) -> T.Schema:
    return T.Schema(
        [T.Field(f["name"], _dtype_from_dict(f["dtype"]), f.get("nullable", True)) for f in d]
    )


def _value_to_dict(v: Any) -> Any:
    if isinstance(v, E.Expr):
        return expr_to_dict(v)
    if isinstance(v, E.SortOrder):
        return {"_k": "SortOrder", "child": expr_to_dict(v.child),
                "ascending": v.ascending, "nulls_first": v.nulls_first}
    if isinstance(v, E.AggExpr):
        return {
            "_k": "AggExpr", "func": v.func,
            "child": expr_to_dict(v.child) if v.child is not None else None,
            "out_name": v.out_name,
            "filter": expr_to_dict(v.filter) if v.filter is not None else None,
            "ignore_nulls": v.ignore_nulls,
            "extra": [expr_to_dict(x) for x in v.extra],
            "max_elems": v.max_elems, "num_bits": v.num_bits,
        }
    if isinstance(v, E.WindowFrame):
        return {"_k": "WindowFrame", "frame_type": v.frame_type,
                "lower": v.lower, "upper": v.upper}
    if isinstance(v, E.WindowExpr):
        return {
            "_k": "WindowExpr", "func": v.func,
            "child": expr_to_dict(v.child) if v.child is not None else None,
            "out_name": v.out_name,
            "partition_by": [expr_to_dict(x) for x in v.partition_by],
            "order_by": [_value_to_dict(o) for o in v.order_by],
            "frame": _value_to_dict(v.frame),
            "offset": v.offset,
            "default": expr_to_dict(v.default) if v.default is not None else None,
        }
    if isinstance(v, T.DataType):
        return {"_k": "DataType", **_dtype_to_dict(v)}
    if isinstance(v, T.Schema):
        return {"_k": "Schema", "fields": _schema_to_dict(v)}
    if isinstance(v, tuple):
        return {"_k": "tuple", "items": [_value_to_dict(x) for x in v]}
    if isinstance(v, bytes):
        return {"_k": "bytes", "hex": v.hex()}
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    import numpy as np

    if isinstance(v, np.generic):
        return v.item()
    raise TypeError(f"cannot serialize {type(v).__name__}: {v!r}")


def _value_from_dict(v: Any) -> Any:
    if not isinstance(v, dict):
        return v
    k = v.get("_k")
    if k == "tuple":
        return tuple(_value_from_dict(x) for x in v["items"])
    if k == "bytes":
        return bytes.fromhex(v["hex"])
    if k == "DataType":
        return _dtype_from_dict(v)
    if k == "Schema":
        return _schema_from_dict(v["fields"])
    if k == "SortOrder":
        return E.SortOrder(expr_from_dict(v["child"]), v["ascending"], v["nulls_first"])
    if k == "AggExpr":
        return E.AggExpr(
            v["func"],
            expr_from_dict(v["child"]) if v["child"] is not None else None,
            v["out_name"],
            expr_from_dict(v["filter"]) if v["filter"] is not None else None,
            v["ignore_nulls"],
            tuple(expr_from_dict(x) for x in v["extra"]),
            v.get("max_elems", 16), v.get("num_bits", 4096),
        )
    if k == "WindowFrame":
        return E.WindowFrame(v["frame_type"], v["lower"], v["upper"])
    if k == "WindowExpr":
        return E.WindowExpr(
            v["func"],
            expr_from_dict(v["child"]) if v["child"] is not None else None,
            v["out_name"],
            tuple(expr_from_dict(x) for x in v["partition_by"]),
            tuple(_value_from_dict(o) for o in v["order_by"]),
            _value_from_dict(v["frame"]),
            v["offset"],
            expr_from_dict(v["default"]) if v["default"] is not None else None,
        )
    if k in _EXPR_CLASSES:
        return expr_from_dict(v)
    if k in _PLAN_CLASSES:
        return _plan_from_dict(v)
    raise TypeError(f"cannot deserialize {k!r}")


def expr_to_dict(e: E.Expr) -> Dict[str, Any]:
    if isinstance(e, E.PythonUdf):
        raise TypeError("PythonUdf carries a host callable and does not serialize")
    out: Dict[str, Any] = {"_k": type(e).__name__}
    for f in dataclasses.fields(e):
        if not f.init:
            continue
        out[f.name] = _value_to_dict(getattr(e, f.name))
    return out


def expr_from_dict(d: Dict[str, Any]) -> E.Expr:
    cls = _EXPR_CLASSES[d["_k"]]
    kwargs = {k: _value_from_dict(v) for k, v in d.items() if k != "_k"}
    return cls(**kwargs)


def _plan_to_dict(p: P.PlanNode) -> Dict[str, Any]:
    out: Dict[str, Any] = {"_k": type(p).__name__}
    for f in dataclasses.fields(p):
        if f.name == "schema":
            continue
        v = getattr(p, f.name)
        if isinstance(v, P.PlanNode):
            out[f.name] = _plan_to_dict(v)
        elif isinstance(v, tuple) and v and isinstance(v[0], P.PlanNode):
            out[f.name] = {"_k": "tuple", "items": [_plan_to_dict(x) for x in v]}
        else:
            out[f.name] = _value_to_dict(v)
    return out


def _plan_from_dict(d: Dict[str, Any]) -> P.PlanNode:
    cls = _PLAN_CLASSES[d["_k"]]
    kwargs = {k: _value_from_dict(v) for k, v in d.items() if k != "_k"}
    return cls(**kwargs)


def plan_to_json(plan: P.PlanNode, indent=None) -> str:
    return json.dumps({"version": VERSION, "plan": _plan_to_dict(plan)}, indent=indent)


def plan_from_json(s: str) -> P.PlanNode:
    doc = json.loads(s)
    if doc.get("version") != VERSION:
        raise ValueError(f"unsupported plan IR version {doc.get('version')}")
    return _plan_from_dict(doc["plan"])
