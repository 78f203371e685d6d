"""True multi-process (multi-host emulation) distributed query:
2 processes x 4 virtual CPU devices, jax.distributed over a localhost
coordinator, global ('data', 'model') mesh spanning both processes, each
process feeding only its own read slice (the DCN recipe of SURVEY §5.8).
Counts must equal the single-device session exactly."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from cammiq_tpu.config import QueryConfig
from cammiq_tpu.query.pipeline import QuerySession


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_multiprocess_distributed_query(tmp_path):
    from dist_fixture import make_dist_fixture

    art, rs, G = make_dist_fixture()
    sess = QuerySession(art.unique_index, art.doubly_index, G,
                        QueryConfig(h=12, batch_size=256))
    ref = sess.run(rs, sc_mode=False)

    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=480) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{se.decode()[-3000:]}")

    z = np.load(tmp_path / "mh_out.npz")
    np.testing.assert_array_equal(z["cnts_u"], ref.cnts_u)
    np.testing.assert_array_equal(z["cnts_d"], ref.cnts_d)
    np.testing.assert_array_equal(z["rcount_u"], ref.rcount_u)
    np.testing.assert_array_equal(z["rcount_d"], ref.rcount_d)
    assert int(z["nundet"]) == ref.nundet
    assert int(z["nconf"]) == ref.nconf
