"""Plan-stability goldens (reference: CometPlanStabilitySuite — TPC-DS
physical plans compared against approved plans; regenerate via
dev/regenerate-golden-files.sh analog below).

Regenerate: python -c "..." (see tests/goldens generation block in repo
history) after INTENTIONAL planner changes only.
"""

import os

import pytest

from datafusion_comet_tpu.ir.serde import plan_to_json
from datafusion_comet_tpu.models import tpcds, tpch

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_plan_stable(name):
    got = plan_to_json(tpch.QUERIES[name](), indent=1)
    with open(os.path.join(GOLDEN, "tpch", f"{name}.json")) as f:
        assert got == f.read(), f"plan for {name} changed — regenerate goldens if intentional"


@pytest.mark.parametrize("name", sorted(n for n, m in tpcds.QUERIES.items()
                                        if "session" not in m.__code__.co_varnames[:1]))
def test_tpcds_plan_stable(name):
    got = plan_to_json(tpcds.QUERIES[name](), indent=1)
    with open(os.path.join(GOLDEN, "tpcds", f"{name}.json")) as f:
        assert got == f.read(), f"plan for {name} changed — regenerate goldens if intentional"
