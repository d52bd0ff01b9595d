"""Distributed TPC-DS parity: full SPMD pipeline (broadcast joins, two-phase
aggregation, exchanges) must match the single-device engine bit-for-bit."""

import numpy as np
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpcds
from datafusion_comet_tpu.parallel.executor import DistributedSession

SF = 0.02
ALL = list(tpcds.SCHEMAS)


@pytest.fixture(scope="module")
def data():
    return tpcds.generate_tables(ALL, SF)


@pytest.mark.parametrize("qname", ["q3", "q42", "q43", "q55"])
def test_distributed_matches_single(data, qname):
    plan = tpcds.QUERIES[qname]()
    d = DistributedSession()
    s = Session()
    for name, cols in data.items():
        d.register_numpy(name, cols, tpcds.SCHEMAS[name])
        s.register_numpy(name, cols, tpcds.SCHEMAS[name])
    got = d.collect(plan)
    ref = s.collect(tpcds.QUERIES[qname]())
    for k in ref:
        if k.endswith("__valid"):
            continue
        np.testing.assert_array_equal(got[k], ref[k], err_msg=f"{qname}:{k}")
