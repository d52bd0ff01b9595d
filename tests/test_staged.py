"""Staged execution: join-heavy plans split into multiple compiled programs
with device-resident intermediates (comet.exec.stage.maxJoinsPerProgram).

Differential contract: staged output == monolithic output, bit-exact, for
the join-heaviest TPC-H queries (the ones whose monolithic XLA programs
exceed the TPU compiler's practical limits — q5, q18 class)."""

import numpy as np
import pytest

from datafusion_comet_tpu.conf import CONF, STAGE_MAX_JOINS
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpch

SF = 0.001


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(
        ["lineitem", "orders", "customer", "supplier", "nation", "region",
         "part", "partsupp"], SF
    )


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def _run(sess, plan, max_joins):
    prev = CONF.get(STAGE_MAX_JOINS)
    CONF.set(STAGE_MAX_JOINS, max_joins)
    try:
        return sess.collect(plan)
    finally:
        CONF.set(STAGE_MAX_JOINS, prev)


def assert_same(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        av, bv = a[k], b[k]
        if av.dtype == object or bv.dtype == object:
            assert list(av) == list(bv), k
        else:
            np.testing.assert_array_equal(av, bv, err_msg=k)


@pytest.mark.parametrize("qname", ["q2", "q5", "q7", "q8", "q9", "q18", "q21"])
def test_staged_matches_monolithic(sess, qname):
    plan_fn = getattr(tpch, qname)
    mono = _run(sess, plan_fn(), 0)      # one program
    staged = _run(sess, plan_fn(), 1)    # one join per program
    assert_same(staged, mono)


def test_stage_temp_tables_freed(sess):
    before = set(sess.tables)
    _run(sess, tpch.q5(), 1)
    after = set(sess.tables)
    assert before == after, "stage temp tables must be freed after execute"


def test_plan_not_mutated_by_staging(sess):
    plan = tpch.q5()
    first = _run(sess, plan, 1)
    # same plan object re-executes fine (staging must not mutate the tree)
    second = _run(sess, plan, 1)
    assert_same(first, second)
