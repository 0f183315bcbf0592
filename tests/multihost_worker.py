"""Worker process for tests/test_multihost.py: joins a 2-process
localhost JAX runtime (gloo CPU collectives, 4 virtual devices per
process => one 8-device global mesh) and exercises exactly the
collectives the sharded engines use, then a cross-process sharded NJ.

Usage: multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import functools
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))

from dipper_tpu.parallel.distributed import (  # noqa: E402
    global_mesh, init_distributed, is_primary, to_host,
)

ppid, pcount = init_distributed(f"localhost:{port}", nproc, pid)
assert (ppid, pcount) == (pid, nproc), (ppid, pcount)
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

mesh = global_mesh()
N = 8 * 16


# --- the _sharded_placement_jit collective set: psum, tiled
# all_gather, axis_index-owned-row broadcast --------------------------------
x = np.arange(N * 16, dtype=np.float32).reshape(N, 16)
xg = jax.device_put(x, NamedSharding(mesh, P("d", None)))


@functools.partial(shard_map, mesh=mesh, in_specs=(P("d", None),),
                   out_specs=(P(), P(None, None), P(None, None)),
                   check_vma=False)
def collectives(xl):
    total = jax.lax.psum(jnp.sum(xl), "d")
    gathered = jax.lax.all_gather(xl, "d", tiled=True)
    # owned-row broadcast (query_ranks pattern): row q via masked psum
    sh = xl.shape[0]
    didx = jax.lax.axis_index("d")
    q = jnp.int32(N - 3)
    lq = q - didx * sh
    owned = (lq >= 0) & (lq < sh)
    row = jnp.where(owned, xl[jnp.clip(lq, 0, sh - 1)],
                    jnp.zeros_like(xl[0]))
    row = jax.lax.psum(row, "d")
    return total.reshape(1), gathered, jnp.broadcast_to(row, (1, 16))


total, gathered, row = jax.jit(collectives)(xg)
np.testing.assert_allclose(to_host(total)[0], x.sum(), rtol=1e-6)
np.testing.assert_array_equal(to_host(gathered), x)
np.testing.assert_array_equal(to_host(row)[0], x[N - 3])

# --- cross-process sharded NJ matches the NumPy oracle ---------------------
from oracle import neighbor_joining, nj_newick  # noqa: E402
from test_nj import random_additive_matrix  # noqa: E402

from dipper_tpu.nj import neighbor_joining_device, nj_tree_newick  # noqa: E402
from dipper_tpu.utils.treecmp import rf_distance  # noqa: E402

n = 96
D = random_additive_matrix(n, np.random.default_rng(13))
names = [f"T{i}" for i in range(n)]
ch, root = neighbor_joining_device(D, dtype="float64", mesh=mesh)
got = nj_tree_newick(ch, root, names)
och, oroot = neighbor_joining(D)
want = nj_newick(och, oroot, names)
rf, nrf = rf_distance(got, want)
assert rf == 0, f"distributed NJ RF={rf}"

if is_primary():
    with open(os.path.join(outdir, "ok"), "w") as f:
        f.write("ok\n")
print(f"[worker {pid}] all checks passed", file=sys.stderr)
