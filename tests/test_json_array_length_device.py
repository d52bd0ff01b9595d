"""Device json_array_length (exec/json_path.py) — differential vs the host
json.loads oracle on well-formed docs; documented deviation on
token-malformed-but-balanced input."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P


def run(expr, vals, width=40):
    s = Session()
    schema = T.Schema([T.Field("s", T.string(width))])
    s.register_numpy("t", {"s": vals}, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias("o")]))
    return [int(v) if ok else None for v, ok in zip(out["o"], out["o__valid"])]


WELLFORMED = [
    "[]", "[1]", "[1,2,3]", '["a","b"]', '[{"a":1},{"b":[2,3]}]',
    '[[1,2],[3]]', '[ 1 , 2 ]', '["x,y","[z]"]', '[{"k":"}"}]',
    '{"a":1}', '"str"', "42", "", None, "not json", "[1,2",
    '[\"a\\\"b\", 2]',
]


def test_matches_host_on_wellformed():
    got = run(F.json_array_length(E.col("s")), WELLFORMED)
    want = run(F.json_array_length_host(E.col("s")), WELLFORMED)
    assert got == want


def test_dict_input():
    vals = ["[1,2]", "[]", '["a"]'] * 40
    got = run(F.json_array_length(E.col("s")), vals, width=12)
    want = run(F.json_array_length_host(E.col("s")), vals, width=12)
    assert got == want


def test_fuzz_wellformed():
    import json as _json
    rng = np.random.default_rng(8)

    def rand_val(d=0):
        k = rng.integers(0, 6 if d < 2 else 3)
        if k == 0:
            return int(rng.integers(-99, 99))
        if k == 1:
            return "s" * int(rng.integers(0, 3))
        if k == 2:
            return None
        if k == 3:
            return bool(rng.integers(2))
        if k == 4:
            return [rand_val(d + 1) for _ in range(rng.integers(0, 4))]
        return {f"k{i}": rand_val(d + 1) for i in range(rng.integers(0, 3))}

    vals = [_json.dumps(rand_val()) for _ in range(300)]
    got = run(F.json_array_length(E.col("s")), vals, width=80)
    want = [len(_json.loads(v)) if isinstance(_json.loads(v), list) else None
            for v in vals]
    assert got == want
