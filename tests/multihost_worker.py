"""Worker process for the multi-host distributed-query test.

usage: python multihost_worker.py <pid> <nproc> <port> <outdir>

Each process gets 4 virtual CPU devices, joins the jax.distributed
cluster, rebuilds the identical fixture, feeds ITS OWN slice of the reads
via make_array_from_process_local_data, and classifies over the global
('data', 'model') mesh.  Process 0 writes the (replicated) counts.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc
assert len(jax.local_devices()) == 4

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dist_fixture import make_dist_fixture  # noqa: E402

from cammiq_tpu.parallel.dist_query import DistSortJoinSession  # noqa: E402
from cammiq_tpu.parallel.multihost import (  # noqa: E402
    global_batch_from_local,
    make_global_mesh,
)

art, rs, G = make_dist_fixture()
mesh = make_global_mesh(model=2)  # 8 global devices -> data=4 x model=2
ds = DistSortJoinSession(mesh, art.unique_index, art.doubly_index, G)

B = rs.codes.shape[0]
lo, hi = pid * B // nproc, (pid + 1) * B // nproc
gc, gl = global_batch_from_local(mesh, rs.codes[lo:hi], rs.lengths[lo:hi])
out = ds.classify(gc, gl)

if pid == 0:
    np.savez(
        os.path.join(outdir, "mh_out.npz"),
        cnts_u=out.cnts_u, cnts_d=out.cnts_d,
        rcount_u=out.rcount_u, rcount_d=out.rcount_d,
        nundet=out.nundet, nconf=out.nconf,
    )
print(f"worker {pid} done", file=sys.stderr)
