"""Worker for the real multi-process (simulated multi-host) test.

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device runtime, and BOTH production sharded pipelines run
with collectives crossing the process boundary — the closest a single
machine gets to the reference-absent "multi-host backend" this framework
adds (SURVEY.md §5 distributed-communication subsystem).

Usage: multiproc_worker.py <proc_id> <n_procs> <port> <devices_per_proc>
(env — JAX_PLATFORMS/XLA_FLAGS — is canonicalized by the spawning test).
Prints "worker <id>: OK" and exits 0 on success.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_T0 = time.time()


def _stamp(msg):
    print(f"[t+{time.time() - _T0:7.1f}s] {msg}", flush=True)


def main(proc_id: int, n_procs: int, port: int, local_devices: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache_multiproc"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.parallel import mesh as meshmod
    # The real multi-host entry — not monkeypatched (P4 coverage).
    meshmod.init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=n_procs,
        process_id=proc_id, local_device_ids=list(range(local_devices)))
    n_global = n_procs * local_devices
    assert jax.process_count() == n_procs
    assert jax.local_device_count() == local_devices
    assert jax.device_count() == n_global

    import hashlib

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _host_sign_rfc6979
    from secp256k1_tpu.ops import limbs as lb
    from secp256k1_tpu.ops import pallas as pk
    from secp256k1_tpu.ops import point as pt
    from secp256k1_tpu.parallel import sharded
    from secp256k1_tpu.utils import hostcurve as hc

    pk.set_enabled(False)
    mesh = meshmod.data_mesh()

    def make_global(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    # --- data-parallel verify across the process boundary -----------------
    b = 2 * n_global
    d_priv = 0xC0FFEE
    pub = hc.mul(d_priv, hc.G)
    digest = hashlib.sha256(b"graft dryrun").digest()
    e_i, r_i, s_i = _host_sign_rfc6979(d_priv, digest)

    def plane(v):
        return make_global(np.asarray(lb.int_to_limbs_batch([v] * b)),
                           P(None, "data"))

    args = (plane(pub[0]), plane(pub[1]), plane(e_i), plane(r_i),
            plane(s_i))
    _stamp("verify dispatch")
    status = sharded.sharded_verify_fn(mesh)(*args)
    local = np.concatenate(
        [np.asarray(s.data).reshape(-1) for s in status.addressable_shards])
    assert local.shape == (b // n_procs,) and (local == 0).all(), local
    bad = args[:3] + (plane((r_i + 1) % hc.N),) + args[4:]
    bad_status = sharded.sharded_verify_fn(mesh)(*bad)
    local = np.concatenate(
        [np.asarray(s.data).reshape(-1)
         for s in bad_status.addressable_shards])
    assert (local != 0).all(), local

    # --- sharded Pippenger MSM: all_gather + add-tree crosses DCN ---------
    n_points = 4 * n_global
    ks = [(i * 7 + 1) % hc.N for i in range(n_points)]
    pts = [hc.mul(i + 1, hc.G) for i in range(n_points)]
    scalars = make_global(np.asarray(lb.int_to_limbs_batch(ks)),
                          P(None, "data"))
    pts_host = pt.from_affine_ints(pts)
    points = pt.Point(make_global(np.asarray(pts_host.x), P(None, "data")),
                      make_global(np.asarray(pts_host.y), P(None, "data")),
                      make_global(np.asarray(pts_host.z), P(None, "data")))
    # AOT-compile the collective module, then BARRIER before first
    # execution: gloo context init exchanges keys with a hard 30 s
    # timeout, and per-process compile skew (measured 107 s on this box:
    # one process compiles while the other waits on the same cores) kills
    # the early process.  The coordination-service barrier absorbs the
    # skew; compiles themselves involve no collectives.
    mfn = sharded.sharded_msm_jit(mesh, window_bits=2)
    compiled = mfn.lower(scalars, points).compile()
    _stamp("msm compiled; waiting at barrier")
    meshmod.barrier("msm-compiled")
    _stamp("msm dispatch")
    result = compiled(scalars, points)
    _stamp("msm dispatched; reading back")
    # Replicated output -> affine compare on host (python ints).
    rx = lb.limbs_to_int(np.asarray(
        result.x.addressable_shards[0].data).reshape(16))
    rz = lb.limbs_to_int(np.asarray(
        result.z.addressable_shards[0].data).reshape(16))
    got_x = rx * pow(rz, hc.P - 2, hc.P) % hc.P
    want = None
    for k, p in zip(ks, pts):
        want = hc.add(want, hc.mul(k, p))
    assert got_x == want[0], (hex(got_x), hex(want[0]))

    _stamp("done")
    print(f"worker {proc_id}: OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         int(sys.argv[4]))
