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


@pytest.mark.parametrize("qname", [
    # star joins / aggregation
    "q3", "q42", "q43", "q55", "q96",
    # rollup (Expand) family
    "q27", "q36", "q86",
    # window family
    "q53", "q89", "q51",
    # multi-channel unions
    "q33", "q56", "q76", "q97",
    # subquery / semi / anti / existence
    "q1", "q10", "q69", "q93", "q94",
    # year-over-year self-joins
    "q31", "q74",
    # inventory / misc
    "q21", "q38", "q87",
])
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
        if getattr(ref[k], "dtype", None) is not None and ref[k].dtype.kind == "f":
            # float reductions sum in exchange arrival order — bit-exactness
            # across partitionings is not part of the contract (Spark's
            # isn't either); everything else must match exactly
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-12,
                                       err_msg=f"{qname}:{k}")
        else:
            np.testing.assert_array_equal(got[k], ref[k], err_msg=f"{qname}:{k}")
