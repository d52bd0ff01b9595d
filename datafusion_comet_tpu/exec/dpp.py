"""Partition pruning for lazy (deferred) hive-partitioned parquet scans:
static filter pruning + dynamic partition pruning (DPP).

Reference analogs:
- static: Spark partitionFilters on CometScanExec — files whose hive
  directory values fail the filter are never listed
  (spark/.../comet/CometScanExec.scala:105-130 selectedPartitions).
- dynamic: CometScanExec.dynamicallySelectedPartitions — a runtime
  subquery filter on a partition column, produced by a join against a
  filtered dimension, prunes the fact side's partitions before the scan
  reads a byte (CometScanExec.scala:108, isDynamicPruningFilter).

TPU-first shape: the engine stages whole tables into device batches, so
pruning happens at RESOLUTION time (Session._resolve_deferred): the dim
side of a qualifying join executes first as its own small query (one
distinct-aggregate), its key values come back to host, and only matching
partition directories are staged. This is strictly a scan-volume
optimization — the join itself still executes exactly.

Safety: a side of a join may only be partition-pruned when the join
discards that side's non-matching rows (inner both sides, left-outer
prunes the right side, right-outer the left, semi the left). The chain
between the scan and the filter/join must be value- and
membership-preserving (Filter / Projection / un-fetched Sort) — a Limit
or Sample between them would change WHICH rows survive, so it blocks
pruning.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["compute_allowed_partitions", "partition_value_str"]


def partition_value_str(v) -> str:
    """Engine value -> hive directory string (the write_parquet_partitioned
    `f"{c}={v}"` rendering)."""
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(v)
    return str(v)


def _walk(plan: P.PlanNode):
    yield plan
    for c in plan.children():
        yield from _walk(c)


def _contains(plan: P.PlanNode, node: P.PlanNode) -> bool:
    return any(n is node for n in _walk(plan))


def _visible_name(node: P.PlanNode, scan: P.PlanNode, pcol: str) -> Optional[str]:
    """The output-column name at ``node`` that carries ``scan``'s partition
    column value unchanged, or None if the chain breaks (non-preserving
    node, rename-away, or the scan is not under ``node``)."""
    if node is scan:
        names = [f.name for f in scan.out_schema().fields]
        return pcol if pcol in names else None
    if isinstance(node, P.Filter):
        return _visible_name(node.child, scan, pcol)
    if isinstance(node, P.Sort) and node.fetch is None and node.skip == 0:
        return _visible_name(node.child, scan, pcol)
    if isinstance(node, P.Projection):
        inner = _visible_name(node.child, scan, pcol)
        if inner is None:
            return None
        for e in node.exprs:
            if isinstance(e, E.ColumnRef) and e.col_name == inner:
                return inner
            if (
                isinstance(e, E.Alias)
                and isinstance(e.child, E.ColumnRef)
                and e.child.col_name == inner
            ):
                return e.out_name
        return None
    return None


def _split_and(e: E.Expr, out: List[E.Expr]) -> None:
    if isinstance(e, E.BinaryOp) and e.op == "and":
        _split_and(e.left, out)
        _split_and(e.right, out)
    else:
        out.append(e)


def _conjunct_values(conj: E.Expr, vis: str) -> Optional[Set[str]]:
    """eq/IN conjunct on the visible partition column -> allowed value set."""
    if isinstance(conj, E.BinaryOp) and conj.op == "eq":
        for a, b in ((conj.left, conj.right), (conj.right, conj.left)):
            if (
                isinstance(a, E.ColumnRef)
                and a.col_name == vis
                and isinstance(b, E.Literal)
                and b.value is not None
            ):
                return {partition_value_str(b.value)}
    if (
        isinstance(conj, E.InList)
        and isinstance(conj.child, E.ColumnRef)
        and conj.child.col_name == vis
        and not getattr(conj, "negated", False)
    ):
        vals = set()
        for lit in conj.values:
            if not isinstance(lit, E.Literal) or lit.value is None:
                return None
            vals.add(partition_value_str(lit.value))
        return vals
    return None


# join types whose semantics discard non-matching rows on a given side
_PRUNABLE_LEFT = (P.JoinType.INNER, P.JoinType.RIGHT, P.JoinType.LEFT_SEMI)
_PRUNABLE_RIGHT = (P.JoinType.INNER, P.JoinType.LEFT)


def compute_allowed_partitions(
    plan: P.PlanNode,
    scan: P.PlanNode,
    part_cols: Sequence[str],
    session,
    dynamic: bool = True,
) -> Dict[str, Set[str]]:
    """Allowed hive values per partition column for one Scan site; columns
    absent from the result are unrestricted. Intersects every applicable
    static filter conjunct and (when ``dynamic``) every qualifying join's
    dimension-side distinct key set."""
    allowed: Dict[str, Set[str]] = {}

    def intersect(col: str, vals: Set[str]) -> None:
        allowed[col] = vals if col not in allowed else (allowed[col] & vals)

    for pcol in part_cols:
        for node in _walk(plan):
            if isinstance(node, P.Filter):
                vis = _visible_name(node.child, scan, pcol)
                if vis is None:
                    continue
                conjs: List[E.Expr] = []
                _split_and(node.predicate, conjs)
                for c in conjs:
                    vals = _conjunct_values(c, vis)
                    if vals is not None:
                        intersect(pcol, vals)
            elif dynamic and isinstance(node, (P.HashJoin, P.SortMergeJoin)):
                on_left = _contains(node.left, scan)
                side = node.left if on_left else node.right
                other = node.right if on_left else node.left
                if _contains(other, scan):
                    continue  # self-join on the same deferred scan site
                if on_left and node.join_type not in _PRUNABLE_LEFT:
                    continue
                if not on_left and node.join_type not in _PRUNABLE_RIGHT:
                    continue
                my_keys = node.left_keys if on_left else node.right_keys
                other_keys = node.right_keys if on_left else node.left_keys
                vis = _visible_name(side, scan, pcol)
                if vis is None:
                    continue
                # Spark's DPP heuristic: only when the other side is
                # selective (has a filter somewhere) — otherwise the dim
                # pre-execution cannot shrink the fact scan
                if not any(isinstance(n, P.Filter) for n in _walk(other)):
                    continue
                for mk, ok in zip(my_keys, other_keys):
                    if not (isinstance(mk, E.ColumnRef) and mk.col_name == vis):
                        continue
                    vals = _distinct_key_values(session, other, ok)
                    if vals is not None:
                        intersect(pcol, vals)
    return allowed


def _distinct_key_values(session, subtree: P.PlanNode, key: E.Expr) -> Optional[Set[str]]:
    """Execute ``SELECT DISTINCT key FROM subtree`` and return the values as
    hive strings (None = give up, scan everything)."""
    try:
        dedup = P.HashAggregate(subtree, (key,), ())
        bound = P.bind_plan(dedup)
        name = bound.schema.fields[0].name
        out = session.collect(dedup)
        vals = out[name]
        valid = out.get(name + "__valid")
        if valid is None:
            import numpy as np

            valid = np.ones(len(vals), bool)
        return {
            partition_value_str(v)
            for v, ok in zip(vals.tolist(), valid.tolist())
            if ok
        }
    except Exception:
        return None  # DPP is an optimization: never fail the query over it
