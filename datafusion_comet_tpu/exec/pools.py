"""Runtime memory pools: greedy / fair-spill reservation accounting.

The analog of the reference's pool family (native/core/src/execution/
memory_pools/ — 8 types: Greedy/FairSpill × {plain, TaskShared, Global,
Unified}, config.rs:22-29, create_memory_pool mod.rs:33). The TPU engine
plans most memory by construction (exec/memory.py), but host-side buffering
— shuffle staging, spill blocks, UDF batches, collected results — still
needs runtime accounting with spill-on-pressure:

- ``GreedyPool``: first-come reservations up to the budget; on exhaustion,
  asks registered consumers to spill (largest first) before failing.
- ``FairSpillPool``: every *spillable* consumer is capped at
  budget / #spillable-consumers (DataFusion's FairSpillPool discipline);
  unspillable reservations take from the shared remainder.
- ``TaskSharedPool``: one pool shared by several task slots with per-task
  bookkeeping, releasing a task's reservations wholesale on completion
  (CometTaskMemoryManager's per-task accounting analog).

Consumers implement ``spill(bytes_needed) -> bytes_freed`` (io/spill.py
writers are natural consumers).
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional

__all__ = ["MemoryReservation", "GreedyPool", "FairSpillPool", "TaskSharedPool",
           "UnboundedPool", "create_memory_pool", "OutOfMemory"]


class OutOfMemory(RuntimeError):
    """Pool exhausted after spilling (CometOutOfMemoryError analog)."""


class MemoryReservation:
    """One consumer's reservation handle (DataFusion MemoryReservation shape)."""

    def __init__(self, pool: "GreedyPool", name: str, spill: Optional[Callable[[int], int]] = None,
                 spillable: bool = True):
        self.pool = pool
        self.name = name
        self.size = 0
        self._spill = spill
        self.spillable = spillable and spill is not None
        self.spill_count = 0
        self.spilled_bytes = 0

    def try_grow(self, n: int) -> None:
        self.pool._grow(self, n)

    def shrink(self, n: int) -> None:
        n = min(n, self.size)
        self.size -= n
        self.pool._release(n)

    def free(self) -> None:
        self.shrink(self.size)

    def do_spill(self, need: int) -> int:
        if not self.spillable or self.size == 0:
            return 0
        freed = min(self._spill(need), self.size)
        self.spill_count += 1
        self.spilled_bytes += freed
        self.size -= freed
        self.pool._release(freed)
        return freed


class GreedyPool:
    """First-come reservations; spills the largest spillable consumers on
    pressure (reference: GreedyMemoryPool + our spill escalation)."""

    def __init__(self, budget_bytes: int):
        self.budget = budget_bytes
        self.used = 0
        self._lock = threading.RLock()
        self._consumers: List[MemoryReservation] = []
        self.total_spills = 0

    def register(self, name: str, spill: Optional[Callable[[int], int]] = None,
                 spillable: bool = True) -> MemoryReservation:
        r = MemoryReservation(self, name, spill, spillable)
        with self._lock:
            self._consumers.append(r)
        return r

    def _headroom_for(self, res: MemoryReservation, n: int) -> int:
        return self.budget - self.used

    def _grow(self, res: MemoryReservation, n: int) -> None:
        with self._lock:
            if n > self._headroom_for(res, n):
                self._spill_until(res, n)
            if n > self._headroom_for(res, n):
                raise OutOfMemory(
                    f"{res.name}: need {n} bytes, used {self.used}/{self.budget}"
                )
            self.used += n
            res.size += n

    def _spill_until(self, requester: MemoryReservation, need: int) -> None:
        victims = sorted(
            (c for c in self._consumers if c.spillable and c is not requester and c.size > 0),
            key=lambda c: -c.size,
        )
        for v in victims:
            if need <= self._headroom_for(requester, need):
                return
            freed = v.do_spill(need)
            if freed:
                self.total_spills += 1
        # finally ask the requester itself to spill
        if need > self._headroom_for(requester, need) and requester.spillable:
            requester.do_spill(need)

    def _release(self, n: int) -> None:
        with self._lock:
            self.used = max(0, self.used - n)

    def stats(self) -> Dict[str, int]:
        return {
            "budget": self.budget,
            "used": self.used,
            "consumers": len(self._consumers),
            "total_spills": self.total_spills,
        }


class FairSpillPool(GreedyPool):
    """Each spillable consumer may hold at most budget/#spillable; the
    unspillable share is first-come (reference: FairSpillPool semantics)."""

    def _headroom_for(self, res: MemoryReservation, n: int) -> int:
        base = self.budget - self.used
        if not res.spillable:
            return base
        k = max(1, sum(1 for c in self._consumers if c.spillable))
        fair_cap = self.budget // k
        return min(base, fair_cap - res.size)


class TaskSharedPool:
    """Per-task views over one shared pool; release_task drops everything a
    task still holds (CometTaskMemoryManager / task_shared.rs analog)."""

    def __init__(self, inner: GreedyPool):
        self.inner = inner
        self._by_task: Dict[int, List[MemoryReservation]] = {}
        self._lock = threading.RLock()

    def register(self, task_id: int, name: str, spill=None, spillable: bool = True) -> MemoryReservation:
        r = self.inner.register(f"task{task_id}/{name}", spill, spillable)
        with self._lock:
            self._by_task.setdefault(task_id, []).append(r)
        return r

    def release_task(self, task_id: int) -> int:
        with self._lock:
            rs = self._by_task.pop(task_id, [])
        freed = sum(r.size for r in rs)
        for r in rs:
            r.free()
        return freed


class UnboundedPool(GreedyPool):
    """No limit — accounting only (reference: MemoryPoolType::Unbounded,
    UnboundedMemoryPool). Stats still track consumers for diagnostics."""

    def __init__(self):
        super().__init__(budget_bytes=1 << 62)


# process-wide singletons (reference: GreedyGlobal / FairSpillGlobal share
# ONE pool across all plans in the process, mod.rs:84-103)
_GLOBALS: Dict[str, GreedyPool] = {}
_GLOBALS_LOCK = threading.Lock()


def create_memory_pool(pool_type: str, budget_bytes: int):
    """The create_memory_pool(config) analog (mod.rs:33): resolve a pool
    type name to an instance. ``*_global`` names return one process-wide
    instance per type; ``*_task_shared`` wrap the base pool in per-task
    bookkeeping; ``unified`` names behave as their plain counterparts (no
    second runtime to unify with here)."""
    t = pool_type.lower()
    base = {
        "unbounded": UnboundedPool,
        "greedy": lambda: GreedyPool(budget_bytes),
        "greedy_unified": lambda: GreedyPool(budget_bytes),
        "fair_spill": lambda: FairSpillPool(budget_bytes),
        "fair_unified": lambda: FairSpillPool(budget_bytes),
    }
    if t in base:
        return base[t]() if callable(base[t]) else base[t]()
    if t in ("greedy_global", "fair_spill_global"):
        with _GLOBALS_LOCK:
            if t not in _GLOBALS:
                cls = GreedyPool if t.startswith("greedy") else FairSpillPool
                _GLOBALS[t] = cls(budget_bytes)
            return _GLOBALS[t]
    if t in ("greedy_task_shared", "fair_spill_task_shared"):
        cls = GreedyPool if t.startswith("greedy") else FairSpillPool
        return TaskSharedPool(cls(budget_bytes))
    raise ValueError(f"unknown memory pool type {pool_type!r}")
