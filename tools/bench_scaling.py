"""Weak-scaling measurement on the virtual CPU mesh -> SCALING_r{N}.json.

Runs the two sharded pipelines at 1/2/4/8 virtual devices with FIXED
per-device work (weak scaling): data-parallel batch verify (lanes/device
constant) and sharded Pippenger MSM (points/device constant).  Efficiency =
T(1) / T(n) (perfect weak scaling keeps wall time flat as work grows with
n).  On the virtual mesh all "devices" share the host CPU, so the numbers
validate the collective structure and overhead, not real ICI bandwidth —
the same jitted modules run unchanged on a real multi-chip mesh.

Usage: python tools/bench_scaling.py [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8"
        " --xla_backend_optimization_level=0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from secp256k1_tpu.ops import limbs as lb
    from secp256k1_tpu.ops import pallas as pk
    from secp256k1_tpu.ops import point as pt
    from secp256k1_tpu.parallel import mesh as meshmod
    from secp256k1_tpu.parallel import sharded
    from secp256k1_tpu.utils import hostcurve as hc

    pk.set_enabled(False)
    lanes_per_dev = int(os.environ.get("SCALE_LANES_PER_DEV", "2048"))
    pts_per_dev = int(os.environ.get("SCALE_PTS_PER_DEV", "4096"))
    # Each mesh size can run in its own process (SCALE_SIZES=4) with results
    # merged into the output JSON — one process per size keeps the XLA:CPU
    # JIT's contiguous code-section arena from overflowing (LLVM "unable to
    # allocate section memory" after several giant CPU modules).
    sizes = [int(s) for s in
             os.environ.get("SCALE_SIZES", "1,2,4,8").split(",")]
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r05.json"
    out = {"lanes_per_device": lanes_per_dev, "points_per_device": pts_per_dev,
           "note": ("weak scaling on xla_force_host_platform virtual devices"
                    " sharing ~4 physical cores: efficiency is expected to"
                    " fall off once n_dev exceeds the core count — the"
                    " numbers validate collective structure/overhead, not"
                    " ICI bandwidth"),
           "host_cpus": os.cpu_count(),
           "verify": {}, "msm": {}}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out["verify"].update(prev.get("verify", {}))
        out["msm"].update(prev.get("msm", {}))

    # One valid signature for verify lanes (replicated; uniform schedule).
    import hashlib
    d_priv = 0xC0FFEE
    pub = hc.mul(d_priv, hc.G)
    digest = hashlib.sha256(b"scaling").digest()
    e_i = int.from_bytes(digest, "big") % hc.N
    # host RFC6979-free quick sig: fixed k (fine for benchmarking math).
    k = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF
    rx, _ = hc.mul(k, hc.G)
    r_i = rx % hc.N
    s_i = pow(k, -1, hc.N) * (e_i + r_i * d_priv) % hc.N
    if s_i > hc.N // 2:
        s_i = hc.N - s_i

    base_pts = [hc.mul(i + 1, hc.G) for i in range(pts_per_dev)]
    base_ks = [(i * 7 + 1) % hc.N for i in range(pts_per_dev)]

    for n_dev in sizes:
        mesh = meshmod.data_mesh(n_dev)

        # ---- verify, lanes = lanes_per_dev * n_dev -----------------------
        b = lanes_per_dev * n_dev

        def plane(v):
            return jnp.asarray(lb.int_to_limbs_batch([v] * b))

        args = meshmod.shard_batch(mesh, (
            plane(pub[0]), plane(pub[1]), plane(e_i), plane(r_i), plane(s_i)))
        vfn = sharded.sharded_verify_jit(mesh, ndim=2)
        np.asarray(vfn(*args))                       # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            st = np.asarray(vfn(*args))
            best = min(best, time.time() - t0)
        assert (st == 0).all()
        out["verify"][str(n_dev)] = {"lanes": b, "seconds": best,
                                     "ops_per_s": b / best}

        # ---- MSM, points = pts_per_dev * n_dev ---------------------------
        pts = base_pts * n_dev
        ks = base_ks * n_dev
        scalars = jnp.asarray(lb.int_to_limbs_batch(ks))
        points = pt.from_affine_ints(pts)
        mfn = sharded.sharded_msm_jit(mesh, window_bits=8)
        res = mfn(scalars, points)
        np.asarray(res.x)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            res = mfn(scalars, points)
            np.asarray(res.x)
            best = min(best, time.time() - t0)

        # Per-stage split: local per-device bucket work vs the
        # all_gather + log-tree + window fold (the collective stage) —
        # explains where weak-scaling loss comes from (VERDICT r4 #5).
        lfn, cfn = sharded.sharded_msm_split_jits(mesh, window_bits=8)
        wsums = lfn(scalars, points)
        np.asarray(wsums)
        np.asarray(cfn(wsums).x)
        t_local = t_comb = float("inf")
        for _ in range(2):
            t0 = time.time()
            wsums = lfn(scalars, points)
            np.asarray(wsums)
            t_local = min(t_local, time.time() - t0)
            t0 = time.time()
            np.asarray(cfn(wsums).x)
            t_comb = min(t_comb, time.time() - t0)
        out["msm"][str(n_dev)] = {
            "points": len(pts), "seconds": best,
            "points_per_s": len(pts) / best,
            "local_bucket_seconds": t_local,
            "gather_tree_fold_seconds": t_comb,
            "comm_stage_fraction": round(t_comb / (t_local + t_comb), 4)}
        print(f"n_dev={n_dev}: verify "
              f"{out['verify'][str(n_dev)]['ops_per_s']:.0f}"
              f" ops/s, msm {out['msm'][str(n_dev)]['points_per_s']:.0f}"
              " pts/s", flush=True)

    if "1" in out["verify"]:
        t1v = out["verify"]["1"]["seconds"]
        out["verify_weak_scaling_efficiency"] = {
            n: round(t1v / v["seconds"], 3)
            for n, v in sorted(out["verify"].items(), key=lambda kv: int(kv[0]))}
    if "1" in out["msm"]:
        t1m = out["msm"]["1"]["seconds"]
        out["msm_weak_scaling_efficiency"] = {
            n: round(t1m / v["seconds"], 3)
            for n, v in sorted(out["msm"].items(), key=lambda kv: int(kv[0]))}

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "scaling_file", "value": path}))


if __name__ == "__main__":
    main()
