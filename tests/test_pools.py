"""Memory pools: greedy/fair-spill reservation + spill-on-pressure
(reference: memory_pools/config.rs 8 pool types, CometTaskMemoryManager)."""

import pytest

from datafusion_comet_tpu.exec.pools import (
    FairSpillPool,
    GreedyPool,
    OutOfMemory,
    TaskSharedPool,
)


class SpillBuffer:
    """Toy spillable consumer: holds `held` bytes, spills all on request."""

    def __init__(self, pool, name):
        self.res = pool.register(name, spill=self._spill)

    def _spill(self, need):
        return self.res.size  # free everything

    def grow(self, n):
        self.res.try_grow(n)


def test_greedy_reserve_release():
    p = GreedyPool(1000)
    r = p.register("a", spillable=False)
    r.try_grow(600)
    assert p.used == 600
    r.shrink(100)
    assert p.used == 500
    r.free()
    assert p.used == 0


def test_greedy_spills_largest_victim():
    p = GreedyPool(1000)
    big = SpillBuffer(p, "big")
    small = SpillBuffer(p, "small")
    big.grow(700)
    small.grow(200)
    r = p.register("incoming", spillable=False)
    r.try_grow(800)  # forces big (largest) to spill
    assert big.res.size == 0 and big.res.spill_count == 1
    assert p.used == 200 + 800
    assert p.total_spills >= 1


def test_greedy_oom_when_unspillable():
    p = GreedyPool(100)
    a = p.register("a", spillable=False)
    a.try_grow(80)
    b = p.register("b", spillable=False)
    with pytest.raises(OutOfMemory):
        b.try_grow(50)


def test_fair_caps_spillable_consumers():
    p = FairSpillPool(1000)
    a = SpillBuffer(p, "a")
    b = SpillBuffer(p, "b")
    a.grow(500)  # exactly the fair share (1000/2)
    # growing past the fair cap forces a to spill ITSELF (the DataFusion
    # FairSpillPool discipline), then the grow succeeds within the cap
    a.res.try_grow(100)
    assert a.res.spill_count == 1 and a.res.size == 100
    b.grow(400)  # within b's cap
    assert p.used == 500


def test_fair_oom_when_spill_frees_nothing():
    p = FairSpillPool(1000)
    a = p.register("a", spillable=True, spill=lambda n: 0)  # refuses to free
    b = p.register("b", spillable=True, spill=lambda n: 0)
    a.try_grow(500)  # fair cap with 2 spillable consumers = 500
    with pytest.raises(OutOfMemory):
        a.try_grow(100)  # over fair cap, spill freed nothing


def test_fair_unspillable_uses_remainder():
    p = FairSpillPool(1000)
    a = SpillBuffer(p, "a")
    u = p.register("u", spillable=False)
    a.grow(400)
    u.try_grow(500)  # unspillable: first-come from the remainder
    assert p.used == 900


def test_task_shared_release():
    inner = GreedyPool(1000)
    tp = TaskSharedPool(inner)
    r1 = tp.register(1, "sort")
    r2 = tp.register(1, "agg")
    r3 = tp.register(2, "sort")
    r1.try_grow(100)
    r2.try_grow(200)
    r3.try_grow(300)
    freed = tp.release_task(1)
    assert freed == 300 and inner.used == 300


def test_create_memory_pool_factory():
    """create_memory_pool(config) analog (memory_pools/mod.rs:33): every
    reference pool type resolves; globals are process-wide singletons."""
    from datafusion_comet_tpu.exec.pools import (
        FairSpillPool, GreedyPool, TaskSharedPool, UnboundedPool,
        create_memory_pool)

    assert isinstance(create_memory_pool("unbounded", 0), UnboundedPool)
    assert isinstance(create_memory_pool("greedy", 100), GreedyPool)
    assert isinstance(create_memory_pool("fair_spill", 100), FairSpillPool)
    assert isinstance(create_memory_pool("greedy_unified", 100), GreedyPool)
    assert isinstance(create_memory_pool("fair_unified", 100), FairSpillPool)
    assert isinstance(create_memory_pool("greedy_task_shared", 100), TaskSharedPool)
    assert isinstance(create_memory_pool("fair_spill_task_shared", 100), TaskSharedPool)
    g1 = create_memory_pool("greedy_global", 100)
    g2 = create_memory_pool("greedy_global", 999)
    assert g1 is g2  # singleton; second budget ignored
    import pytest as _pt
    with _pt.raises(ValueError):
        create_memory_pool("nope", 1)


def test_session_spill_registration_accounts_host_bytes(tmp_path):
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.batch import from_numpy
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.exec.pools import TaskSharedPool
    from datafusion_comet_tpu.io.spill import SpillWriter

    sch = T.Schema([T.Field("v", T.INT64, False)])
    path = str(tmp_path / "b.spill")
    w = SpillWriter(path)
    w.write_batch(from_numpy({"v": np.arange(64, dtype=np.int64)}, sch))
    w.close()

    s = Session()
    s.register_spill("sp", path, sch)
    pool = s.host_pool
    inner = pool.inner if isinstance(pool, TaskSharedPool) else pool
    assert inner.used > 0  # the spill bytes are accounted
    out = s.collect(__import__("datafusion_comet_tpu.ir.plan", fromlist=["P"]).Scan("sp", sch))
    assert len(out["v"]) == 64
