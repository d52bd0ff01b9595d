"""Grace (hash-partitioned) out-of-HBM join execution.

When a stage's join intermediates exceed the HBM budget
(exec/memory.py plan_peak_bytes vs device_budget_bytes), the engine
splits the join into K hash partitions: both inputs are partition-sorted
by murmur3(join keys) % K — one stable device sort each, the counting-sort
scatter shape of the reference's shuffle partitioner
(native/shuffle/src/partitioners/multi_partition.rs:36-99: hash → counting
sort into partition_starts/partition_row_indices → per-partition take) —
and the join then runs K times at ~1/K capacity through ONE compiled XLA
program (partition k of the left can only match partition k of the right).
Pair outputs are compacted to live rows and unioned.

This is the TPU analog of the reference's spill-on-pressure partitioned
execution (shuffle_writer.rs:52 buffering + spill; the Grace hash join of
the classical literature): where the reference spills partition buffers to
disk and re-reads them, inputs here usually FIT in HBM (SF10 lineitem ≈
3.4 GB staged) while the join's sort/pair-list intermediates do not
(sf10-hbm-plan-r4.json: q3 49 GB, q5 147 GB peaks vs 16 GB HBM) — so
partitions stay device-resident as contiguous slices of the
partition-sorted input, and only the per-pair working set is bounded.

Skew/overflow: partition sizes are read on the host after the partition
sort (a K+1-int D2H), so per-pair capacities are EXACT — no skew guess; a
hot key inflates only its own partition's capacity class.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector, pad_capacity
from datafusion_comet_tpu.exec.evaluator import (EvalContext, _murmur3_column,
                                                 evaluate)
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["GraceJoinRunner", "find_grace_join", "partition_sort",
           "grace_key_cast", "GRACE_MAX_PARTITIONS"]

GRACE_MAX_PARTITIONS = 64

_INT_IDS = ("INT8", "INT16", "INT32", "INT64")


def grace_key_cast(ldt: T.DataType, rdt: T.DataType):
    """Common hash dtype for one join-key pair, or raise ValueError when the
    pair can't be partition-hashed consistently on both sides.

    Both sides must produce IDENTICAL murmur3 partition ids for equal key
    values; mixed integer widths hash differently in the Spark scheme
    (murmur3_hash_i32 vs i64), so both cast to INT64. Floats/decimals are
    refused: -0.0/0.0 and NaN normalization could place equal-comparing
    keys in different partitions."""
    for dt in (ldt, rdt):
        ok = (dt.type_id in _INT_IDS or dt.type_id in ("DATE", "TIMESTAMP")
              or dt.is_boolean or dt.is_binary)
        if not ok:
            raise ValueError(f"grace join: unhashable key dtype {dt.type_id}")
    if ldt.type_id == rdt.type_id:
        return None
    if ldt.type_id in _INT_IDS and rdt.type_id in _INT_IDS:
        return T.INT64
    raise ValueError(
        f"grace join: mixed key dtypes {ldt.type_id}/{rdt.type_id}")


def _hash_pids(batch: Batch, keys: Sequence[E.Expr], casts, K: int,
               ctx: EvalContext) -> jax.Array:
    """murmur3(seed=42) partition ids over the key columns, Spark pmod
    (comet_partitioning.rs:52) — the same scheme the shuffle partitioner
    uses, so grace partitions line up with exchange partitions."""
    h = jnp.full(batch.capacity, 42, jnp.int32)
    for kexpr, tgt in zip(keys, casts):
        cv = evaluate(kexpr, batch, ctx)
        if tgt is not None and cv.dtype.type_id != tgt.type_id:
            cv = ColumnVector(cv.data.astype(jnp.int64), cv.validity, None, tgt)
        h = _murmur3_column(cv, h)
    m = h % jnp.int32(K)
    return jnp.where(m < 0, m + K, m)


def partition_perm(batch: Batch, pids: jax.Array, K: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Stable partition permutation: perm orders rows by partition id with
    dead rows last; partition k occupies perm[starts[k]:starts[k+1]].

    CANONICAL program shape: a 3-operand (key, iota, mask) sort ONLY — no
    data moves here. Partitions are then gathered straight from the
    ORIGINAL batch through perm slices (_make_extract), so each input row
    is gathered exactly once across all pairs instead of once into a
    sorted copy and again at extraction (and the sorted copy's HBM
    footprint never exists). A payload-riding variadic sort at SF10
    lineitem capacity is also the tunnel-compiler pole class the AQE
    shrink already hit (docs/known_issues.md: one isolated 8M×14-column
    variadic sort measured >27 min to compile)."""
    cap = batch.capacity
    key = jnp.where(batch.row_mask, pids, K).astype(jnp.int32)
    counts = jnp.zeros(K + 1, jnp.int32).at[key].add(1)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts[:K], dtype=jnp.int32)])
    iota = jnp.arange(cap, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
    return perm, starts


def partition_sort(batch: Batch, pids: jax.Array, K: int
                   ) -> Tuple[Batch, jax.Array]:
    """Materialized variant of partition_perm (kept for direct callers and
    tests): returns the partition-sorted batch + starts."""
    perm, starts = partition_perm(batch, pids, K)
    cols = [c.take(perm) for c in batch.columns]
    mask = jnp.take(batch.row_mask, perm)
    return Batch(tuple(cols), mask, batch.schema), starts


def _make_extract(cap_k: int):
    """One jitted partition extractor per (side schema, cap_k): a cap_k-row
    double-indirect gather (perm slice → original rows) at a traced start
    offset."""

    @jax.jit
    def ex(b: Batch, perm: jax.Array, start: jax.Array,
           end: jax.Array) -> Batch:
        pos = start + jnp.arange(cap_k, dtype=jnp.int32)
        take_pos = jnp.minimum(pos, b.capacity - 1)
        idx = jnp.take(perm, take_pos)
        mask = (pos < end) & jnp.take(b.row_mask, idx)
        return b.take(idx, mask)

    return ex


def _subtree_tables(plan: P.PlanNode, out: set) -> None:
    if isinstance(plan, P.Scan):
        out.add(plan.table)
    for c in plan.children():
        _subtree_tables(c, out)


def find_grace_join(stage: P.PlanNode, tables, budget: int
                    ) -> Optional[P.HashJoin]:
    """Topmost HashJoin whose subtree peak estimate exceeds the budget and
    whose keys/type admit consistent hash partitioning. SMJ is excluded:
    its output ordering contract (sort elision, ir/ordering.py) would be
    broken by the partition union."""
    from datafusion_comet_tpu.exec.memory import plan_peak_bytes

    def walk(p) -> Optional[P.HashJoin]:
        if isinstance(p, P.HashJoin):
            if p.join_type == P.JoinType.LEFT_ANTI_NULL_AWARE:
                pass  # needs global null knowledge; partitions can't decide
            else:
                refs: set = set()
                _subtree_tables(p, refs)
                caps = [tables[t].capacity for t in refs if t in tables]
                # 2x margin: plan_peak_bytes sums every operator output and
                # XLA frees earlier, so estimates just past the budget run
                # fine DIRECT (SF10 q2's 6-join chain over 8M-row partsupp);
                # the true OOM cases overshoot by 4-11x (q3 49 GB, q5
                # 147 GB vs 12.8 GB). Grace partitioning pays compile +
                # partition costs, so it must not trigger on estimate noise.
                if caps and plan_peak_bytes(p, max(caps)) > 2 * budget:
                    try:
                        for lk, rk in zip(p.left_keys, p.right_keys):
                            grace_key_cast(lk.dtype, rk.dtype)
                    except ValueError:
                        pass
                    else:
                        return p
        for c in p.children():
            hit = walk(c)
            if hit is not None:
                return hit
        return None

    return walk(stage)


_HINT_ATTRS = ("fanout_hint", "unique_build_hint", "presorted_build",
               "key_pack", "rf_dense_range", "build_key_range",
               "cond_col_ranges")


def _contains(p: P.PlanNode, target: P.PlanNode) -> bool:
    if p is target:
        return True
    return any(_contains(c, target) for c in p.children())


def _src_name(e: E.Expr):
    while isinstance(e, (E.Alias, E.Cast)):
        e = e.child
    if isinstance(e, (E.ColumnRef, E.BoundRef)):
        return e.col_name
    return None


def plan_grace_downstream(stage: P.PlanNode, gj: P.HashJoin):
    """Decide whether the stage's post-join operators can run INSIDE the
    per-partition-pair programs instead of over the unioned join result —
    the partition-wise aggregation that keeps every compiled program at
    pair scale (the reference's Partial → exchange → Final contract,
    operator.proto:480-484, applied to grace partitions):

    * ("local", A): the single HashAggregate's group keys include a join
      key column — groups are partition-local, so the WHOLE stage
      (including a top-K sort root) runs per pair and the union of pair
      outputs only needs the root sort re-applied. SF10 q3's 15M-group
      aggregate + top-10 never materializes at full scale.
    * ("partial", A): any group keys — each pair emits PARTIAL aggregate
      states; the runner merges (PARTIAL_MERGE) and finishes (FINAL) at
      group capacity. SF10 q5's 25-group SUM collapses per pair.
    * None: no pushdown (plain union of pair join outputs).
    """
    chain: List[P.PlanNode] = []
    node = stage
    while node is not gj:
        kids = node.children()
        if len(kids) != 1:
            hit = [c for c in kids if _contains(c, gj)]
            if len(hit) != 1:
                return None
            # multi-child node (another join) above gj: no pushdown
            return None
        chain.append(node)
        node = kids[0]
    aggs = [n for n in chain if isinstance(n, P.HashAggregate)]
    if len(aggs) != 1 or aggs[0].mode != P.AggMode.SINGLE:
        return None
    A = aggs[0]
    ai = chain.index(A)
    if not all(isinstance(n, (P.Filter, P.Projection))
               for n in chain[ai + 1:]):
        return None
    above = chain[:ai]
    # trace each group key's source name down to the join output
    def at_join(name):
        cur = name
        for n in chain[ai + 1:]:
            if isinstance(n, P.Projection):
                src = None
                for x in n.exprs:
                    try:
                        if x.name == cur:
                            src = _src_name(x)
                    except Exception:
                        pass
                if src is None:
                    return None
                cur = src
        return cur

    keynames = {nm for nm in
                (_src_name(k) for k in list(gj.left_keys) + list(gj.right_keys))
                if nm}
    local = False
    for g in A.group_exprs:
        nm = _src_name(g)
        nm = at_join(nm) if nm else None
        if nm and nm in keynames:
            local = True
            break
    # local mode fires when the agg is the stage root (or under a
    # row-preserving chain), optionally under a top-K Sort root: each
    # pair's groups are COMPLETE, so the union of per-pair stage outputs
    # IS the stage output (plus a final re-sort when the root sorts)
    root_sort_ok = (isinstance(stage, P.Sort) and stage.fetch
                    and all(isinstance(n, (P.Filter, P.Projection))
                            for n in above[1:]))
    chain_ok = all(isinstance(n, (P.Filter, P.Projection)) for n in above)
    if local and (root_sort_ok or chain_ok):
        return ("local", A)
    try:  # partial states must exist for every aggregate function
        from datafusion_comet_tpu.exec.streaming import _partial_schema

        _partial_schema(A)
    except Exception:
        return None
    est_groups = A.max_groups or (1 << 16)
    if est_groups > (1 << 20):
        return None  # K × huge partials would re-create the monster
    return ("partial", A)


class GraceJoinRunner:
    """Re-runnable grace execution of one HashJoin node: compiled pieces
    (child programs, partition sorts, extractors, the pair-join program,
    per-pair shrinks) build on the first call and are reused on every
    re-run (the benchmark/serving path re-executes the whole partitioned
    join per repetition — timings include the partition sorts)."""

    def __init__(self, session, join: P.HashJoin, K: int, temp_names,
                 stage: Optional[P.PlanNode] = None, downstream=None):
        self.session = session
        self.join = join
        self.K = K
        self.stage = stage
        self.downstream = downstream  # None | ("local"|"partial", agg node)
        sid = next(session._stage_ids)
        self.tmp = f"__grace{sid}"
        self.gl = f"__gracel{sid}"
        self.gr = f"__gracer{sid}"
        self.temp_names = temp_names
        self._built = False
        if downstream is None:
            self.out_schema = join.schema
        elif downstream[0] == "local":
            self.out_schema = stage.schema
        else:
            self.out_schema = downstream[1].schema
        # compiled state, filled by first __call__
        self._left_rerun = None
        self._right_rerun = None
        self._lshrink = None
        self._rshrink = None
        self._part_l = None
        self._part_r = None
        self._ex_l: Dict[int, object] = {}
        self._ex_r: Dict[int, object] = {}
        self._pair_fns: Dict[Tuple[int, int], object] = {}
        self._pair_caps: Optional[List[Tuple[int, int]]] = None
        self._pair_shrinks: List[Optional[object]] = []
        self._template = None
        self._template_schema = None
        self._final_fn = None
        self._fanout = None
        self._scale = 1

    # -- plumbing ----------------------------------------------------------------
    def _mini_plan(self, capL: int, capR: int) -> P.HashJoin:
        j = self.join
        scan_l = P.Scan(self.gl, j.left.schema)
        scan_l.schema = j.left.schema
        scan_r = P.Scan(self.gr, j.right.schema)
        scan_r.schema = j.right.schema
        mini = P.HashJoin(scan_l, scan_r, j.left_keys, j.right_keys,
                          j.join_type, j.build_side, j.condition)
        mini.schema = j.schema
        for a in _HINT_ATTRS:
            v = getattr(j, a, None)
            if v is not None:
                setattr(mini, a, v)
        est = getattr(j, "out_rows_hint", None)
        if est:
            mini.out_rows_hint = max(int(est) // self.K, 2048)
        return mini

    def _build_template(self, pair_bound: int) -> P.PlanNode:
        """Per-pair program: the mini join alone, or the stage's downstream
        pushed inside it (partition-wise aggregation — see
        plan_grace_downstream). ``pair_bound``: group-capacity clamp
        derived from the observed partition sizes."""
        mini = self._mini_plan(0, 0)
        if self.downstream is None:
            return mini
        from datafusion_comet_tpu.exec.engine import _replace_child_pure_deep

        mode, A = self.downstream
        if mode == "local":
            stage2 = _replace_child_pure_deep(self.stage, self.join, mini)

            def find_agg(p):
                if isinstance(p, P.HashAggregate):
                    return p
                for c in p.children():
                    got = find_agg(c)
                    if got is not None:
                        return got
                return None

            agg2 = find_agg(stage2)
            agg2.max_groups = min(A.max_groups or pair_bound, pair_bound)
            if isinstance(stage2, P.Sort) and stage2.skip:
                # per-pair top-K must keep skip+fetch rows; the global skip
                # applies in the final re-sort over the union
                stage2.fetch = (stage2.fetch or 0) + stage2.skip
                stage2.skip = 0
            return stage2
        # partial: each pair emits aggregate STATES (operator.proto:480)
        from datafusion_comet_tpu.exec.streaming import _partial_schema

        child2 = (mini if A.child is self.join
                  else _replace_child_pure_deep(A.child, self.join, mini))
        partial = P.HashAggregate(
            child2, A.group_exprs, A.agg_exprs, P.AggMode.PARTIAL,
            min(A.max_groups or pair_bound, pair_bound))
        partial.schema = _partial_schema(A)
        return partial

    def _pair_fn(self, capL: int, capR: int, pair_bound: int):
        """One compiled per-pair program per distinct (capL, capR) class —
        with near-uniform murmur3 partitions this is one or two compiles
        (and jax re-specializes one program across capacity classes)."""
        key = (capL, capR, self._fanout, self._scale)
        fn = self._pair_fns.get(key)
        if fn is None:
            if self._template is None:
                self._template = self._build_template(pair_bound)
                self._template_schema = self._template.schema
            _, raw = self.session.compile(
                self._template, join_fanout=self._fanout,
                agg_scale=self._scale,
                unique_join_ok=(self._scale == 1))
            # serialize the first (compiling) CALL: jax compiles lazily at
            # first invocation, and concurrent cache-miss grace pair
            # compiles through the tunnel backend wedge parallel suite
            # builds for 40+ min (the shrink-lock discipline,
            # docs/known_issues.md "Concurrent tunnel compiles can wedge")
            from datafusion_comet_tpu.exec.engine import _SHRINK_COMPILE_LOCK

            box = {"warm": False}

            def fn(tables, _raw=raw, _box=box):
                if not _box["warm"]:
                    with _SHRINK_COMPILE_LOCK:
                        out = _raw(tables)
                    _box["warm"] = True
                    return out
                return _raw(tables)

            self._pair_fns[key] = fn
        return fn

    def _finish(self, union_batch: Batch) -> Batch:
        """Post-union step: identity for plain/local modes; PARTIAL states
        → FINAL aggregate at group capacity for partial mode."""
        if self.downstream is None or self.downstream[0] == "local":
            return union_batch
        _mode, A = self.downstream
        if self._final_fn is None:
            from datafusion_comet_tpu.exec.engine import run_plan
            from datafusion_comet_tpu.exec.streaming import _pseudo_scan

            merge_groups = tuple(
                E.bind(E.col(g.name), self._template_schema)
                for g in A.group_exprs)
            maxg = A.max_groups

            @jax.jit
            def run_final(acc: Batch) -> Batch:
                node = P.HashAggregate(
                    _pseudo_scan("__acc", acc.schema), merge_groups,
                    A.agg_exprs, P.AggMode.FINAL, maxg)
                node.schema = A.schema
                return run_plan(node, {"__acc": acc}, EvalContext())

            self._final_fn = run_final
        return self._final_fn(union_batch)

    def __call__(self) -> None:
        import os as _os

        dbg = bool(_os.environ.get("COMET_DEBUG_GRACE"))

        def _mem(tag):
            if not dbg:
                return
            try:
                st = jax.devices()[0].memory_stats() or {}
                print(f"[grace {self.tmp}] {tag}: "
                      f"{st.get('bytes_in_use', 0) / 1e9:.2f} GB in use",
                      flush=True)
            except Exception:
                pass

        s = self.session
        j = self.join
        K = self.K
        _mem(f"enter K={K} mode="
             f"{self.downstream[0] if self.downstream else 'union'}")
        if self._fanout is None:
            self._fanout = s.join_fanout
        if self._left_rerun is None:
            left0, self._left_rerun = s._prepare_subtree(j.left, self.temp_names)
            left0, self._lshrink = s._aqe_shrink(left0, force=True)
            right0, self._right_rerun = s._prepare_subtree(j.right, self.temp_names)
            right0, self._rshrink = s._aqe_shrink(right0, force=True)
        else:
            left0 = self._left_rerun()
            if self._lshrink is not None:
                left0 = self._lshrink(left0)
            right0 = self._right_rerun()
            if self._rshrink is not None:
                right0 = self._rshrink(right0)
        casts = [grace_key_cast(lk.dtype, rk.dtype)
                 for lk, rk in zip(j.left_keys, j.right_keys)]
        if self._part_l is None:
            lkeys, rkeys = j.left_keys, j.right_keys

            @jax.jit
            def part_l(b):
                return partition_perm(b, _hash_pids(b, lkeys, casts, K,
                                                    EvalContext()), K)

            @jax.jit
            def part_r(b):
                return partition_perm(b, _hash_pids(b, rkeys, casts, K,
                                                    EvalContext()), K)

            self._part_l, self._part_r = part_l, part_r
        _mem("children executed")
        permL, startsL = self._part_l(left0)
        permR, startsR = self._part_r(right0)
        _mem("partition-permuted")
        sl = np.asarray(startsL)
        sr = np.asarray(startsR)
        sizesL = np.diff(sl)
        sizesR = np.diff(sr)
        pair_bound = int(pad_capacity(
            2 * max(int(sizesL.max(initial=0)), int(sizesR.max(initial=0)), 8)))
        outs: List[Optional[Batch]] = [None] * K
        shrinks_ready = bool(self._pair_shrinks)
        if not shrinks_ready:
            self._pair_shrinks = [None] * K
        from datafusion_comet_tpu.exec.engine import JoinOverflowError
        for attempt in range(s.max_join_retries):
            pending = [k for k in range(K) if outs[k] is None]
            if not pending:
                break
            overflowed = False
            force_k0 = (self.downstream is not None
                        and self.downstream[0] == "partial")
            for k in pending:
                if sizesL[k] == 0 and sizesR[k] == 0 and not (
                        force_k0 and k == 0):
                    # nothing on either side; union skips it. Exception:
                    # partial mode always runs pair 0 so a global (no-group)
                    # aggregate still emits its zero-state row.
                    continue
                capL = int(pad_capacity(max(int(sizesL[k]), 8)))
                capR = int(pad_capacity(max(int(sizesR[k]), 8)))
                exl = self._ex_l.get(capL)
                if exl is None:
                    exl = self._ex_l[capL] = _make_extract(capL)
                exr = self._ex_r.get(capR)
                if exr is None:
                    exr = self._ex_r[capR] = _make_extract(capR)
                s.tables[self.gl] = exl(left0, permL, startsL[k],
                                        startsL[k + 1])
                s.tables[self.gr] = exr(right0, permR, startsR[k],
                                        startsR[k + 1])
                fn = self._pair_fn(capL, capR, pair_bound)
                out, ovf = fn(s.tables)
                if bool(ovf):
                    overflowed = True
                    continue
                sh = self._pair_shrinks[k]
                if sh is None:
                    out, fnk = s._aqe_shrink(out, force=True)
                    self._pair_shrinks[k] = fnk if fnk is not None else False
                elif sh is not False:
                    out = sh(out)
                outs[k] = out
                _mem(f"pair {k} done (capL={capL} capR={capR})")
            if not overflowed:
                break
            self._fanout *= 4
            self._scale *= 4
        else:
            raise JoinOverflowError(
                f"grace join fan-out exceeded after {s.max_join_retries} retries")
        s.tables.pop(self.gl, None)
        s.tables.pop(self.gr, None)
        del left0, right0, permL, permR
        _mem("pairs done")
        live = [o for o in outs if o is not None]
        if not live:
            # empty join result: one dead batch at minimal capacity
            from datafusion_comet_tpu.exec.streaming import _dead_batch

            s.tables[self.tmp] = _dead_batch(self.out_schema, 8)
            return
        uschema = (self._template_schema if self._template is not None
                   else j.schema)
        if len(live) == 1:
            s.tables[self.tmp] = self._finish(live[0])
            return
        from datafusion_comet_tpu.exec.engine import _union

        s.tables[self.tmp] = self._finish(_union(live, uschema))
