"""Concurrent-compile stress: N threads build and run separate queries on
ONE shared Session (the tpcbench --compile-workers topology that exposed
the r3/r4 shared-state races: trace-state corruption, half-built scalar
subquery value dicts, temp-table churn retracing another thread's
program). The r5 fix class: compiled programs take ONLY the tables their
plan scans as jit inputs, subquery materialization serializes under a
lock with per-thread reentrancy, and stage ids are atomic.

Queries chosen from the historical offenders: q64/q71/q86 (bare
AssertionError under 4 workers in r4), q8/q20 (subquery materialization
race, fixed r4), q4 (multi-CTE self-joins)."""

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpcds as model

QUERIES = ["q64", "q71", "q86", "q8", "q20", "q4"]
SF = 0.005


@pytest.fixture(scope="module")
def stress_sess():
    s = Session()
    for t in model.SCHEMAS:
        data = model.generate_table(t, SF)
        s.register_numpy(t, data, model.SCHEMAS[t])
    return s


def _build_and_run(sess, name):
    make = model.QUERIES[name]
    plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
    run = sess.prepare(plan)
    out = run()
    return int(np.asarray(out.num_rows()))


def test_concurrent_builds_match_serial(stress_sess):
    serial = {}
    for q in QUERIES:
        serial[q] = _build_and_run(stress_sess, q)
    for trial in range(2):
        with ThreadPoolExecutor(4) as ex:
            futs = {q: ex.submit(_build_and_run, stress_sess, q)
                    for q in QUERIES}
            for q, fu in futs.items():
                assert fu.result() == serial[q], (
                    f"{q} trial {trial}: concurrent row count "
                    f"{fu.result()} != serial {serial[q]}")


def test_concurrent_same_query(stress_sess):
    """The same query built from 4 threads simultaneously (shared subquery
    registry, shared jit caches) must agree with itself."""
    with ThreadPoolExecutor(4) as ex:
        rows = list(ex.map(lambda _: _build_and_run(stress_sess, "q86"),
                           range(4)))
    assert len(set(rows)) == 1, rows
