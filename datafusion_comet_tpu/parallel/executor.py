"""Distributed plan execution: SPMD over a device mesh via shard_map.

The multi-device analog of exec/engine.py. Responsibility split mirrors the
reference (SURVEY.md §2d): Spark's per-task data parallelism → per-device
SPMD; CometShuffleExchangeExec → all_to_all; broadcast → all_gather; the
two-phase aggregate tree (Partial → exchange → Final, operator.proto:480)
→ partial agg per device, hash exchange on group keys, final agg per device.

``distribute(plan)`` rewrites a logical single-node plan into a distributed
one by inserting exchange nodes; ``DistributedSession`` shards tables row-wise
over the mesh and jits the whole SPMD step (one XLA program per device, all
collectives compiled in — no host round-trips between stages).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector, from_numpy, to_numpy
from datafusion_comet_tpu.exec.engine import run_plan
from datafusion_comet_tpu.exec.evaluator import EvalContext
from datafusion_comet_tpu.exec.operators import aggregate as AGG
from datafusion_comet_tpu.exec.operators import basic as B
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.parallel.mesh import PARTITION_AXIS, make_mesh
from datafusion_comet_tpu.parallel.shuffle import (
    partition_ids_range,
    range_boundaries_spmd,
    broadcast_batch,
    partition_ids_hash,
    partition_ids_round_robin,
    shuffle_batch,
)

__all__ = ["DistributedSession", "distribute", "run_plan_spmd"]


# -------------------------------------------------------------------------------------
# Distributed planning: insert exchanges (the CometExecRule analog)
# -------------------------------------------------------------------------------------


@dataclasses.dataclass
class Broadcast(P.PlanNode):
    """Physical node: replicate child to all devices (all_gather)."""

    child: P.PlanNode

    def children(self):
        return (self.child,)


def distribute(plan: P.PlanNode, num_partitions: int) -> P.PlanNode:
    """Rewrite a bound logical plan for SPMD execution.

    Rules (bottom-up):
    - HashAggregate(SINGLE) → Partial → ShuffleExchange(hash group keys)
      → Final.  Ungrouped aggregates exchange to a single partition.
    - HashJoin → broadcast the build side (dimension tables) — hash
      co-partitioning is chosen when both sides carry a repartition hint.
    - Sort/Limit → local, then gather to partition 0 and re-run (the
      single-partition merge the reference does in JVM sinks,
      CometCollectLimitExec.scala:64).
    """
    plan = P.bind_plan(plan) if plan.schema is None else plan
    return _dist(plan, num_partitions)


def _dist(plan: P.PlanNode, np_: int) -> P.PlanNode:
    if isinstance(plan, P.Scan):
        return plan
    if isinstance(plan, P.HashAggregate) and plan.mode == P.AggMode.SINGLE:
        child = _dist(plan.child, np_)
        mg = plan.max_groups or (1 << 16)
        partial_ = P.HashAggregate(
            child, plan.group_exprs, plan.agg_exprs, P.AggMode.PARTIAL,
            max(mg // max(np_, 1), 1024) if mg > 2048 else mg,
        )
        partial_.schema = _partial_schema(plan)
        if plan.group_exprs:
            keys = tuple(E.bind(E.col(g.name), partial_.schema) for g in plan.group_exprs)
            ex = P.ShuffleExchange(partial_, "hash", keys, np_)
        else:
            ex = P.ShuffleExchange(partial_, "single", (), np_)
        ex.schema = partial_.schema
        # rebind group refs against the state schema for the final stage
        final_groups = tuple(E.bind(E.col(g.name), ex.schema) for g in plan.group_exprs)
        final = P.HashAggregate(ex, final_groups, plan.agg_exprs, P.AggMode.FINAL, mg)
        final.schema = plan.schema
        if not plan.group_exprs:
            # ungrouped: every device's final emits its one mandatory row;
            # only partition 0 (the single-exchange target) keeps it
            pid = E.SparkPartitionId()
            object.__setattr__(pid, "dtype", T.INT32)
            pred = E.BinaryOp("eq", pid, E.lit(0, T.INT32))
            object.__setattr__(pred, "dtype", T.BOOL)
            keep = P.Filter(final, pred)
            keep.schema = plan.schema
            return keep
        return final
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        left = _dist(plan.left, np_)
        right = _dist(plan.right, np_)
        build = plan.build_side if isinstance(plan, P.HashJoin) else "right"
        jt = plan.join_type
        if (jt == P.JoinType.FULL
                or (jt == P.JoinType.RIGHT and build == "right")
                or (jt == P.JoinType.LEFT and build == "left")):
            # the build side's unmatched rows reach the output: a broadcast
            # build would emit them once PER DEVICE. Hash co-partition BOTH
            # sides on the join keys instead (the reference keeps outer
            # joins shuffled the same way, CometShuffleExchangeExec): every
            # key — and every null-keyed outer row, since murmur3 leaves
            # the seed unchanged on null — lives on exactly one device, so
            # matched pairs and unmatched rows each emit exactly once.
            exl = P.ShuffleExchange(left, "hash", tuple(plan.left_keys), np_)
            exl.schema = plan.left.schema
            exr = P.ShuffleExchange(right, "hash", tuple(plan.right_keys), np_)
            exr.schema = plan.right.schema
            out = dataclasses.replace(plan, left=exl, right=exr)
            if isinstance(out, P.HashJoin) and jt != P.JoinType.FULL:
                # co-partitioned sides make the build choice free; the local
                # join requires the outer side to be the probe
                out.build_side = "left" if jt == P.JoinType.RIGHT else "right"
            out.schema = plan.schema
            return out
        if build == "left":
            left = Broadcast(left)
            left.schema = plan.left.schema
        else:
            right = Broadcast(right)
            right.schema = plan.right.schema
        out = dataclasses.replace(plan, left=left, right=right)
        out.schema = plan.schema
        return out
    if isinstance(plan, P.Window):
        # a device must see EVERY row of each window partition: hash-exchange
        # on the keys every window expr partitions by (their common subset
        # suffices — finer per-expr partitions nest inside it); a window with
        # no common key (global rank) gathers to one partition (reference:
        # Spark requires ClusteredDistribution / AllTuples under WindowExec)
        child = _dist(plan.child, np_)
        keysets = [{repr(k) for k in w.partition_by} for w in plan.window_exprs]
        common = set.intersection(*keysets) if keysets else set()
        if common:
            first = plan.window_exprs[0].partition_by
            keys = tuple(k for k in first if repr(k) in common)
            ex = P.ShuffleExchange(child, "hash", keys, np_)
        else:
            ex = P.ShuffleExchange(child, "single", (), np_)
        ex.schema = plan.child.schema
        out = P.Window(ex, plan.window_exprs)
        out.schema = plan.schema
        return out
    if isinstance(plan, P.BroadcastNestedLoopJoin):
        left = _dist(plan.left, np_)
        right = _dist(plan.right, np_)
        if plan.join_type in (P.JoinType.RIGHT, P.JoinType.FULL):
            # right/full outer would emit broadcast-side unmatched rows once
            # PER DEVICE — gather to a single partition instead
            exl = P.ShuffleExchange(left, "single", (), np_)
            exl.schema = left.schema
            exr = P.ShuffleExchange(right, "single", (), np_)
            exr.schema = right.schema
            out = P.BroadcastNestedLoopJoin(exl, exr, plan.join_type, plan.condition)
            out.schema = plan.schema
            return out
        b = Broadcast(right)
        b.schema = plan.right.schema
        out = P.BroadcastNestedLoopJoin(left, b, plan.join_type, plan.condition)
        out.schema = plan.schema
        return out
    if isinstance(plan, P.Sort):
        child = _dist(plan.child, np_)
        if plan.fetch is None and plan.skip == 0 and plan.orders:
            # full sort: range-exchange so every device owns one key range —
            # concatenated device order IS the global order; no single-device
            # merge bottleneck (reference analog: Spark RangePartitioning
            # shuffle before Sort; partitioning.proto RangePartition)
            ex = P.ShuffleExchange(child, "range", (), np_, plan.orders)
            ex.schema = child.schema
            final = P.Sort(ex, plan.orders, None, 0)
            final.schema = plan.schema
            return final
        # top-K / skip: local pre-sort (fetch pushdown) then gather + final sort
        local = P.Sort(child, plan.orders, plan.fetch and plan.fetch + plan.skip, 0)
        local.schema = child.schema
        ex = P.ShuffleExchange(local, "single", (), np_)
        ex.schema = child.schema
        final = P.Sort(ex, plan.orders, plan.fetch, plan.skip)
        final.schema = plan.schema
        return final
    if isinstance(plan, P.Limit):
        child = _dist(plan.child, np_)
        local = P.Limit(child, plan.limit + plan.offset, 0)
        local.schema = child.schema
        ex = P.ShuffleExchange(local, "single", (), np_)
        ex.schema = child.schema
        final = P.Limit(ex, plan.limit, plan.offset)
        final.schema = plan.schema
        return final
    # default: rebuild with distributed children
    kids = [_dist(c, np_) for c in plan.children()]
    out = _replace_children(plan, kids)
    return out


def _partial_schema(agg: P.HashAggregate) -> T.Schema:
    fields = [T.Field(g.name, g.dtype) for g in agg.group_exprs]
    for a in agg.agg_exprs:
        fields += AGG.state_fields(a)
    return T.Schema(fields)


def _replace_children(plan: P.PlanNode, kids: List[P.PlanNode]) -> P.PlanNode:
    if not kids:
        return plan
    if isinstance(plan, P.Filter):
        out = P.Filter(kids[0], plan.predicate)
    elif isinstance(plan, P.Projection):
        out = P.Projection(kids[0], plan.exprs)
    elif isinstance(plan, P.HashAggregate):
        out = P.HashAggregate(kids[0], plan.group_exprs, plan.agg_exprs, plan.mode, plan.max_groups)
    elif isinstance(plan, P.Expand):
        out = P.Expand(kids[0], plan.projections, plan.names)
    elif isinstance(plan, P.Explode):
        out = P.Explode(kids[0], plan.expr, plan.outer, plan.pos)
    elif isinstance(plan, P.Sample):
        out = P.Sample(kids[0], plan.lower_bound, plan.upper_bound, plan.with_replacement, plan.seed)
    elif isinstance(plan, P.Window):
        out = P.Window(kids[0], plan.window_exprs)
    elif isinstance(plan, P.ShuffleExchange):
        out = P.ShuffleExchange(kids[0], plan.partitioning, plan.keys, plan.num_partitions, plan.sort_orders)
    elif isinstance(plan, P.Union):
        out = P.Union(tuple(kids))
    elif isinstance(plan, Broadcast):
        out = Broadcast(kids[0])
    else:
        raise NotImplementedError(f"distribute: {type(plan).__name__}")
    out.schema = plan.schema
    return out


# -------------------------------------------------------------------------------------
# SPMD execution
# -------------------------------------------------------------------------------------


def run_plan_spmd(
    plan: P.PlanNode,
    tables: Dict[str, Batch],
    num_partitions: int,
    axis_name: str = PARTITION_AXIS,
    join_fanout: int = 4,
    single_device: bool = False,
    shuffle_slack: int = 2,
    agg_scale: int = 1,
) -> Tuple[Batch, jax.Array]:
    """Execute a distributed plan; call inside shard_map (tables are the
    per-device shards). Returns (local result batch, overflow flag)."""
    ctx = EvalContext(num_partitions=num_partitions, agg_scale=agg_scale)
    if not single_device:
        ctx.partition_id = jax.lax.axis_index(axis_name)
    flags: List[jax.Array] = []
    ctx.overflow_flags = flags
    out = _exec_spmd(plan, tables, ctx, flags, num_partitions, axis_name, join_fanout, single_device, shuffle_slack)
    ovf = jnp.any(jnp.stack(flags)) if flags else jnp.zeros((), bool)
    if not single_device:
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis_name).astype(bool)
    return out, ovf


def _exec_spmd(plan, tables, ctx, flags, np_, axis, fanout, single, slack=2) -> Batch:
    rec = lambda p: _exec_spmd(p, tables, ctx, flags, np_, axis, fanout, single, slack)
    if isinstance(plan, Broadcast):
        child = rec(plan.child)
        if single:
            return child
        return broadcast_batch(child, axis)
    if isinstance(plan, P.ShuffleExchange):
        child = rec(plan.child)
        if plan.partitioning == "hash":
            pids = partition_ids_hash(child, plan.keys, np_, ctx)
        elif plan.partitioning == "single":
            pids = jnp.zeros(child.capacity, jnp.int32)
        elif plan.partitioning == "round_robin":
            pids = partition_ids_round_robin(child, np_)
        elif plan.partitioning == "range":
            blimbs = range_boundaries_spmd(
                child, plan.sort_orders, np_, axis, ctx, single_device=single
            )
            pids = partition_ids_range(child, plan.sort_orders, blimbs, ctx)
        else:
            raise NotImplementedError(f"partitioning {plan.partitioning}")
        if plan.partitioning == "single":
            slot_cap = child.capacity  # everything lands on device 0
        else:
            # skew headroom: slack× the perfectly-balanced rows/partition
            slot_cap = max((slack * child.capacity) // np_, 16)
        out, ovf = shuffle_batch(child, pids, axis, np_, slot_cap=slot_cap, single_device=single)
        flags.append(ovf)
        return out
    if isinstance(plan, (P.Scan, P.Filter, P.Projection, P.HashAggregate, P.Sort,
                         P.Limit, P.Expand, P.Explode, P.Sample, P.Window, P.Union,
                         P.HashJoin, P.SortMergeJoin, P.BroadcastNestedLoopJoin)):
        # structural recursion with SPMD children, local operator execution
        if isinstance(plan, P.Scan):
            return run_plan(plan, tables, ctx, flags, fanout)
        kids = [rec(c) for c in plan.children()]
        return _local_apply(plan, kids, tables, ctx, flags, fanout)
    raise NotImplementedError(f"spmd exec: {type(plan).__name__}")


def _local_apply(plan, kids, tables, ctx, flags, fanout) -> Batch:
    """Run one operator locally given already-executed children."""
    from datafusion_comet_tpu.exec import engine as ENG

    # temporarily register children as pseudo-tables and delegate to run_plan
    # on a shallow plan — avoids duplicating the operator dispatch.
    pseudo = dict(tables)
    new_kids = []
    for i, k in enumerate(kids):
        nm = f"__child_{id(plan)}_{i}"
        pseudo[nm] = k
        sc = P.Scan(nm, k.schema)
        sc.schema = k.schema
        new_kids.append(sc)
    shallow = _replace_children_exec(plan, new_kids)
    return ENG.run_plan(shallow, pseudo, ctx, flags, fanout)


def _replace_children_exec(plan, kids):
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin, P.BroadcastNestedLoopJoin)):
        out = dataclasses.replace(plan, left=kids[0], right=kids[1])
    elif isinstance(plan, P.Union):
        out = P.Union(tuple(kids))
    else:
        out = dataclasses.replace(plan, child=kids[0])
    out.schema = plan.schema
    return out


# -------------------------------------------------------------------------------------
# Session
# -------------------------------------------------------------------------------------


class DistributedSession:
    """Multi-device session: tables sharded row-wise over the mesh; plans
    rewritten by distribute() and executed as one shard_mapped XLA program.

    Accepts a 1-D mesh (axis "p") or a multi-host-shaped 2-D mesh with axes
    ("dcn", "ici") — outer axis spanning hosts over DCN, inner axis the
    chips of one host over ICI (the jax multi-host convention; How to Scale
    Your Model's mesh recipe). Collectives then run over the flattened axis
    tuple, so XLA routes the intra-host legs over ICI and only the
    cross-host legs over DCN."""

    def __init__(self, mesh: Optional[Mesh] = None, join_fanout: int = 4):
        self.mesh = mesh or make_mesh()
        self.axis = (tuple(self.mesh.axis_names) if len(self.mesh.axis_names) > 1
                     else self.mesh.axis_names[0])
        self.num_partitions = self.mesh.devices.size
        self.join_fanout = join_fanout
        self.tables: Dict[str, Batch] = {}

    def register_numpy(self, name: str, data, schema: T.Schema) -> None:
        """Row-partition host data over the mesh: shard i holds original rows
        [i*per, i*per+per) in its cap-row slot (the analog of Spark's input
        split assignment)."""
        from datafusion_comet_tpu.exec.stats import collect_stats

        if not hasattr(self, "stats"):
            self.stats = {}
        self.stats[name] = collect_stats(data, schema)
        np_ = self.num_partitions
        n = len(next(iter(data.values())))
        per = -(-n // np_)
        from datafusion_comet_tpu.exec.batch import pad_capacity

        cap = pad_capacity(per)
        batch = from_numpy(data, schema, capacity=cap * np_)  # rows front-packed
        mask = np.zeros(cap * np_, bool)
        for i in range(np_):
            take = min(max(n - i * per, 0), per)
            mask[i * cap : i * cap + take] = True
        idx = np.concatenate([np.arange(i * per, i * per + cap) for i in range(np_)])
        idx = np.clip(idx, 0, cap * np_ - 1)
        batch = batch.take(jnp.asarray(idx), jnp.asarray(mask))
        self.tables[name] = self._shard(batch)

    def _shard(self, batch: Batch) -> Batch:
        sh = NamedSharding(self.mesh, PSpec(self.axis))
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def compile(self, plan: P.PlanNode, shuffle_slack: int = 2, join_fanout=None,
                agg_scale: int = 1):
        if plan.schema is None:
            from datafusion_comet_tpu.ir.pruning import prune_columns

            bound = P.bind_plan(prune_columns(plan))
        else:
            bound = plan
        from datafusion_comet_tpu.exec.stats import derive_capacities

        derive_capacities(bound, getattr(self, "stats", {}))
        dplan = distribute(bound, self.num_partitions)
        np_ = self.num_partitions
        fanout = join_fanout or self.join_fanout
        mesh = self.mesh

        axis = self.axis

        def step(tables):
            fn = shard_map(
                lambda t: run_plan_spmd(
                    dplan, t, np_, axis, fanout, False, shuffle_slack,
                    agg_scale,
                ),
                mesh=mesh,
                in_specs=(PSpec(axis),),
                out_specs=(PSpec(axis), PSpec()),
                check_vma=False,
            )
            return fn(tables)

        return dplan, jax.jit(step)

    def execute(self, plan: P.PlanNode) -> Batch:
        """Execute with skew re-planning: on shuffle-bucket or join-fanout
        overflow, retry with doubled slot slack and 4x join fan-out (the
        AQE-like adaptive re-plan; reference analog: spill-on-pressure +
        AQE skew splitting, SURVEY.md §5)."""
        slack, fanout, scale = 2, self.join_fanout, 1
        for attempt in range(4):
            dplan, fn = self.compile(plan, shuffle_slack=slack, join_fanout=fanout,
                                     agg_scale=scale)
            out, ovf = fn(self.tables)
            if not bool(jnp.any(ovf)):
                return out
            slack *= 2
            fanout *= 4
            scale *= 4
        raise RuntimeError("shuffle/join/group overflow after skew re-planning retries")

    def collect(self, plan: P.PlanNode):
        return to_numpy(self.execute(plan))
