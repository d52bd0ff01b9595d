"""Child program for the multi-PROCESS mesh test (tests/test_multiprocess_mesh.py).

Two processes × 4 virtual CPU devices each form one 8-device global mesh via
jax.distributed; the collectives in shuffle_batch / broadcast_batch then
cross a REAL process boundary (Gloo over localhost) — the DCN stand-in the
single-process virtual mesh cannot exercise (SURVEY §2d-2: the distributed
communication backend).

Run: python tests/_mp_child.py <process_id> <coordinator_port>
Prints "MP_OK <pid>" on success; any assertion kills the exit code.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from datafusion_comet_tpu import types as T  # noqa: E402
from datafusion_comet_tpu.exec.batch import from_numpy  # noqa: E402
from datafusion_comet_tpu.ir import expr as E  # noqa: E402
from datafusion_comet_tpu.parallel.shuffle import (  # noqa: E402
    broadcast_batch, partition_ids_hash, shuffle_batch)

assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

NDEV = 8
N = 2048              # global rows
LOCAL = N // 2        # rows this process owns
mesh = Mesh(np.array(jax.devices()), ("dp",))

# deterministic global data; each process materializes ITS half
rng = np.random.default_rng(7)
keys_all = rng.integers(0, 500, N).astype(np.int64)
vals_all = rng.integers(0, 1000, N).astype(np.int64)
lo, hi = pid * LOCAL, (pid + 1) * LOCAL

schema = T.Schema([T.Field("k", T.INT64), T.Field("v", T.INT64)])
local_batch = from_numpy({"k": keys_all[lo:hi], "v": vals_all[lo:hi]},
                         schema, capacity=LOCAL)

row_sh = NamedSharding(mesh, P("dp"))


def to_global(leaf):
    a = np.asarray(leaf)
    gshape = (N,) + a.shape[1:]
    sh = NamedSharding(mesh, P(*(("dp",) + (None,) * (a.ndim - 1))))
    return jax.make_array_from_process_local_data(sh, a, gshape)


gbatch = jax.tree_util.tree_map(to_global, local_batch)

specs = jax.tree_util.tree_map(lambda _: P("dp"), local_batch)


@jax.jit
def step(b):
    def inner(bb):
        pids = partition_ids_hash(bb, [E.bind(E.col("k"), schema)], NDEV)
        out, ovf = shuffle_batch(bb, pids, "dp", NDEV)
        bc = broadcast_batch(bb, "dp")
        n_bc = jnp.sum(bc.row_mask.astype(jnp.int32))[None]
        # two-phase aggregation: local partial sum -> psum (the
        # Partial -> Final tree of operator.proto:480-484)
        part = jnp.sum(jnp.where(bb.row_mask, bb.columns[1].data, 0))
        total = jax.lax.psum(part, "dp")[None]
        return out, ovf[None], n_bc, total

    return shard_map(inner, mesh=mesh, in_specs=(specs,),
                     out_specs=(specs, P("dp"), P("dp"), P("dp")),
                     check_rep=False)(b)


out, ovf, n_bc, totals = step(gbatch)

# pull everything to every process for checking
out_k = multihost_utils.process_allgather(out.columns[0].data, tiled=True)
out_v = multihost_utils.process_allgather(out.columns[1].data, tiled=True)
out_m = multihost_utils.process_allgather(out.row_mask, tiled=True)
ovf_all = multihost_utils.process_allgather(ovf, tiled=True)
n_bc_all = multihost_utils.process_allgather(n_bc, tiled=True)
tot_all = multihost_utils.process_allgather(totals, tiled=True)

assert not ovf_all.any(), "shuffle overflow"
# broadcast: every device saw all N live rows
assert (n_bc_all == N).all(), n_bc_all
# psum total matches the host oracle on every device
assert (tot_all == vals_all.sum()).all(), (tot_all, vals_all.sum())

# exchange correctness: every live row landed on the device == its
# Spark-exact hash partition, and the global multiset is preserved
from datafusion_comet_tpu.parallel.shuffle import _murmur3_column  # noqa: E402

host_batch = from_numpy({"k": keys_all, "v": vals_all}, schema, capacity=N)
hp = np.asarray(partition_ids_hash(host_batch,
                                   [E.bind(E.col("k"), schema)], NDEV))[:N]
slot = len(out_k) // NDEV
got_pairs = []
for d in range(NDEV):
    seg = slice(d * slot, (d + 1) * slot)
    for k, v, m in zip(out_k[seg], out_v[seg], out_m[seg]):
        if m:
            got_pairs.append((int(k), int(v), d))
want_pairs = sorted((int(k), int(v), int(p))
                    for k, v, p in zip(keys_all, vals_all, hp))
assert sorted(got_pairs) == want_pairs, "exchange misplacement"

print(f"MP_OK {pid}", flush=True)
