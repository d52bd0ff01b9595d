"""Shuffle spill-on-pressure round trip: rows that overflow their exchange
slot are captured on device, persisted through io/spill.SpillWriter, read
back, re-exchanged in a second pass, and the union equals a one-pass
exchange with enough slack (reference: shuffle_writer.rs max_buffer_bytes →
writers/local/spill.rs — buffered partitions spill and the query keeps
going instead of retrying from scratch)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, from_numpy, to_numpy
from datafusion_comet_tpu.io.spill import SpillReader, SpillWriter
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.parallel.shuffle import (
    capture_shuffle_overflow,
    partition_ids_hash,
    shuffle_batch,
)


def _pids(batch, P):
    return partition_ids_hash(batch, [E.bind(E.col("k"), SCHEMA)], P)

SCHEMA = T.Schema([T.Field("k", T.INT64), T.Field("v", T.INT64)])


def _batch(n, seed=0, skew_key=7):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 64, n)
    k[: n // 2] = skew_key  # heavy skew: half the rows hash to one bucket
    return from_numpy({"k": k.astype(np.int64), "v": np.arange(n, dtype=np.int64)}, SCHEMA)


def _rows(batch):
    out = to_numpy(batch)
    return sorted(zip(out["k"].tolist(), out["v"].tolist()))


def test_capture_plus_second_pass_equals_big_slack(tmp_path):
    import jax.numpy as jnp

    P = 4
    b = _batch(512)
    pids = _pids(b, P)

    tight = 64  # forces overflow on the skewed bucket
    out1, ovf = shuffle_batch(b, pids, None, P, slot_cap=tight, single_device=True)
    assert bool(ovf), "skew must overflow the tight slot cap"
    spilled, spill_pid = capture_shuffle_overflow(b, pids, P, tight)
    n_spilled = int(np.asarray(spilled.row_mask).sum())
    assert n_spilled > 0

    # persist the captured rows (host offload) and read them back
    w = SpillWriter(str(tmp_path / "ovf.blocks"))
    w.write_batch(spilled)
    w.close()
    r = SpillReader(str(tmp_path / "ovf.blocks"), SCHEMA)
    assert r.num_blocks() == 1
    spilled_back = r.read_batch(0)

    # second pass: exchange ONLY the spilled rows — the driver knows the
    # spilled count after reading it back and sizes the slots accordingly
    # (cheap: the spilled set is small by construction)
    pids2 = _pids(spilled_back, P)
    out2, ovf2 = shuffle_batch(spilled_back, pids2, None, P,
                               slot_cap=n_spilled, single_device=True)
    assert not bool(ovf2)

    # union(first pass survivors, second pass) == one-pass with big slack
    big, ovf_big = shuffle_batch(b, pids, None, P, slot_cap=512, single_device=True)
    assert not bool(ovf_big)
    assert sorted(_rows(out1) + _rows(out2)) == _rows(big)


def test_capture_empty_when_no_overflow():
    P = 4
    b = _batch(128, skew_key=1)
    pids = _pids(b, P)
    out, ovf = shuffle_batch(b, pids, None, P, slot_cap=128, single_device=True)
    assert not bool(ovf)
    spilled, _ = capture_shuffle_overflow(b, pids, P, 128)
    assert int(np.asarray(spilled.row_mask).sum()) == 0


def test_captured_rows_are_exactly_the_dropped_ones():
    P = 2
    b = _batch(256)
    pids = _pids(b, P)
    tight = 32
    out1, ovf = shuffle_batch(b, pids, None, P, slot_cap=tight, single_device=True)
    assert bool(ovf)
    spilled, _ = capture_shuffle_overflow(b, pids, P, tight)
    all_rows = _rows(b)
    assert sorted(_rows(out1) + _rows(spilled)) == all_rows


def test_register_spill_as_table(tmp_path):
    """ShuffleScanExec analog: spilled blocks read back as a query input
    (resident) and block-by-block (streamed aggregate)."""
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.batch import from_numpy
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.io.spill import SpillWriter
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P

    sch = T.Schema([T.Field("g", T.INT64, False), T.Field("v", T.INT64, False)])
    rng = np.random.default_rng(4)
    parts = []
    path = str(tmp_path / "blocks.spill")
    w = SpillWriter(path)
    for _ in range(3):
        d = {"g": rng.integers(0, 8, 256).astype(np.int64),
             "v": rng.integers(-50, 50, 256).astype(np.int64)}
        parts.append(d)
        w.write_batch(from_numpy(d, sch, dictionary=False))
    w.close()

    allg = np.concatenate([p["g"] for p in parts])
    allv = np.concatenate([p["v"] for p in parts])
    exp = {int(g): int(allv[allg == g].sum()) for g in range(8)}

    s = Session()
    s.register_spill("sp", path, sch)
    agg = P.Scan("sp", sch).aggregate(
        [E.col("g")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 16
    out = s.collect(agg.sort([E.SortOrder(E.col("g"))]))
    assert {int(g): int(v) for g, v in zip(out["g"], out["sv"])} == exp

    s2 = Session()
    s2.register_spill("sp", path, sch, stream=True)
    agg2 = P.Scan("sp", sch).aggregate(
        [E.col("g")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg2.max_groups = 16
    res = s2.spill_aggregate(agg2, "sp")
    from datafusion_comet_tpu.exec.batch import to_numpy

    got = to_numpy(res)
    assert {int(g): int(v) for g, v in zip(got["g"], got["sv"])} == exp


@pytest.mark.parametrize("codec", ["zstd", "lz4", "snappy", "zlib", "none"])
def test_codec_roundtrip(tmp_path, codec):
    """Every codec (reference ipc.rs:24-46 magic set) round-trips a batch
    byte-exactly; unavailable codecs resolve to zlib rather than fail."""
    from datafusion_comet_tpu.io.spill import resolve_codec

    b = _batch(1000, seed=3)
    path = str(tmp_path / f"spill_{codec}.bin")
    w = SpillWriter(path, codec=codec)
    assert w.codec == resolve_codec(codec)
    w.write_batch(b)
    w.close()
    r = SpillReader(path, SCHEMA)
    assert r.num_blocks() == 1
    assert _rows(r.read_batch(0)) == _rows(b)


def test_cross_codec_blocks_in_one_file(tmp_path):
    """A reader dispatches per-block on the magic tag, so a file whose blocks
    were written under different codec configs still reads."""
    import struct as _s

    from datafusion_comet_tpu.io import spill as SP

    b1, b2 = _batch(300, seed=1), _batch(300, seed=2)
    path = str(tmp_path / "mixed.bin")
    w = SpillWriter(path, codec="zstd")
    w.write_batch(b1)
    w.codec = SP.resolve_codec("lz4")
    w.write_batch(b2)
    w.close()
    r = SpillReader(path, SCHEMA)
    assert _rows(r.read_batch(0)) == _rows(b1)
    assert _rows(r.read_batch(1)) == _rows(b2)


def test_default_codec_is_zstd_when_available():
    from datafusion_comet_tpu.io import native as N
    from datafusion_comet_tpu.io.spill import resolve_codec

    if N.zstd_available():
        assert resolve_codec() == "zstd"
    else:
        assert resolve_codec() == "zlib"
