"""REAL multi-process run: 2 processes x 4 virtual CPU devices joined by
`jax.distributed.initialize`, with the production sharded verify + MSM
pipelines' collectives crossing the process boundary.

This is the machine-checked version of the multi-host story (SURVEY.md §5
"distributed communication backend"): same mesh/pjit/shard_map code as
`tests/test_parallel.py`, but the 8-device mesh spans two OS processes, so
the all_gather/psum paths exercise the cross-process wiring that a real
multi-host TPU pod would run over DCN.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_pipelines():
    n_procs, local_devices = 2, 4
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(f"--xla_force_host_platform_device_count={local_devices}"
                   " --xla_backend_optimization_level=0"),
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n_procs), str(port),
             str(local_devices)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(n_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out}"
        assert f"worker {i}: OK" in out
