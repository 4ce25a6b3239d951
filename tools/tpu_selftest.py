"""Hardware self-test: every fused Pallas kernel vs the python-int oracle.

Runs on the real chip (or any backend with Pallas enabled) and checks
bit-exactness of: mod_mul / mod_square / mod_pow2k (u32 and f32 variants),
point_add / point_double / point_double4 / point_add_mixed /
point_lookup_add, and the mega-fused glv_windowed_mult, all against
utils/hostcurve + python ints.  Prints one OK/MISMATCH line per kernel and
exits nonzero on any mismatch.

This is the hardware companion of tests/test_kernel_bodies.py (the point
bodies are too expensive to compile on XLA:CPU).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FAILED = []
RESULTS = {}


def check(name, ok):
    print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    RESULTS[name] = "OK" if ok else "MISMATCH"
    if not ok:
        FAILED.append(name)


def main():
    import random
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.ops import limbs as lb
    from secp256k1_tpu.ops.pallas import kernels as pk
    from secp256k1_tpu.utils import hostcurve as hc

    R = random.Random(1337)
    S = 8
    B = S * 128
    P = pk.P

    def plane(vals):
        return jnp.asarray(lb.int_to_limbs_batch(vals).reshape(16, S, 128))

    def ints(x):
        return lb.limbs_to_int_batch(np.asarray(x).reshape(16, B))

    a_i = [R.randrange(P) for _ in range(B)]
    b_i = [R.randrange(P) for _ in range(B)]
    a, b = plane(a_i), plane(b_i)

    for f32 in (True, False):
        pk.set_f32(f32)
        tag = "f32" if f32 else "u32"
        got = ints(jax.jit(lambda x, y: pk.mod_mul(x, y, P))(a, b))
        check(f"mod_mul_{tag}", got == [x * y % P for x, y in zip(a_i, b_i)])
        got = ints(jax.jit(lambda x: pk.mod_square(x, P))(a))
        check(f"mod_square_{tag}", got == [x * x % P for x in a_i])
        got = ints(jax.jit(lambda x: pk.mod_pow2k(x, 16, P))(a))
        check(f"mod_pow2k16_{tag}", got == [pow(x, 1 << 16, P) for x in a_i])
    pk.set_f32(True)

    # Points: batch of random multiples of G (+ identity in lane 0 for the
    # complete-formula edge).
    pts1 = [None] + [hc.mul(R.randrange(1, hc.N), hc.G) for _ in range(B - 1)]
    pts2 = [hc.mul(R.randrange(1, hc.N), hc.G) for _ in range(B)]
    pts2[1] = pts1[1]                       # doubling case through add

    def point_planes(pts):
        xs = [0 if p is None else p[0] for p in pts]
        ys = [1 if p is None else p[1] for p in pts]
        zs = [0 if p is None else 1 for p in pts]
        return plane(xs), plane(ys), plane(zs)

    def affine_of(xi, yi, zi):
        out = []
        for x, y, z in zip(ints(xi), ints(yi), ints(zi)):
            if z == 0:
                out.append(None)
            else:
                zi_ = pow(z, P - 2, P)
                out.append((x * zi_ % P, y * zi_ % P))
        return out

    x1, y1, z1 = point_planes(pts1)
    x2, y2, z2 = point_planes(pts2)
    got = affine_of(*jax.jit(pk.point_add)(x1, y1, z1, x2, y2, z2))
    check("point_add", got == [hc.add(p, q) for p, q in zip(pts1, pts2)])
    got = affine_of(*jax.jit(pk.point_double)(x1, y1, z1))
    check("point_double", got == [hc.add(p, p) for p in pts1])
    got = affine_of(*jax.jit(pk.point_double4)(x1, y1, z1))
    check("point_double4", got == [hc.mul(16, p) if p else None
                                   for p in pts1])
    got = affine_of(*jax.jit(pk.point_add_mixed)(x1, y1, z1, x2, y2))
    check("point_add_mixed", got == [hc.add(p, q)
                                     for p, q in zip(pts1, pts2)])

    # Full GLV mega kernel vs host scalar mult (through ops.glv).
    from secp256k1_tpu.ops import glv
    from secp256k1_tpu.ops import point as ptmod
    from secp256k1_tpu.ops import table as tblmod
    from secp256k1_tpu.ops import pallas as pal
    pal.set_enabled(True)
    # Edge scalars first (0, 1, n-1, low/high halves), then random.
    ks = [0, 1, hc.N - 1, 2**128 - 1, hc.N - 2**128] + \
        [R.randrange(hc.N) for _ in range(B - 5)]
    base = [hc.mul(R.randrange(1, hc.N), hc.G) for _ in range(B)]
    kp = plane(ks)
    pp = ptmod.Point(plane([p[0] for p in base]), plane([p[1] for p in base]),
                     plane([1] * B))
    want = [hc.mul(k, p) for k, p in zip(ks, base)]
    for signed in (True, False):
        pk.set_mega_signed(signed)
        res = jax.jit(glv.scalar_mult)(kp, pp)
        got = affine_of(res.x, res.y, res.z)
        tag = "signed" if signed else "unsigned"
        check(f"glv_windowed_mult_{tag}", got == want)
    pk.set_mega_signed(True)

    # The u8 split-operand multiply variant through the mega kernel.
    pk.set_mulv("u8")
    res = jax.jit(lambda k, q: glv.scalar_mult(k, q))(kp, pp)
    got = affine_of(res.x, res.y, res.z)
    check("glv_windowed_mult_mulv_u8", got == want)
    pk.set_mulv("u32")

    # Fixed-base mult (fused MXU-lookup + windowed-add path), k=0 included.
    ks2 = [0] + [R.randrange(hc.N) for _ in range(B - 1)]
    res = jax.jit(tblmod.scalar_base_mult)(plane(ks2))
    got = affine_of(res.x, res.y, res.z)
    want = [hc.mul(k, hc.G) for k in ks2]
    check("scalar_base_mult_w8", got == want)

    # Fused verify tail (u1*G + u2*P in one base-accumulation launch).
    # Edge lanes: u1=0, u2=0, both 0, and an R=infinity cancellation.
    u1s = [0, R.randrange(hc.N), 0] + [R.randrange(hc.N)
                                       for _ in range(B - 3)]
    u2s = [R.randrange(hc.N), 0, 0] + [R.randrange(hc.N)
                                       for _ in range(B - 3)]
    ts = [R.randrange(1, hc.N) for _ in range(B)]
    u1s[3] = (-u2s[3] * ts[3]) % hc.N        # u1*G + u2*(t*G) = infinity
    basep = [hc.mul(t, hc.G) for t in ts]
    pp2 = ptmod.Point(plane([p[0] for p in basep]),
                      plane([p[1] for p in basep]), plane([1] * B))
    res = jax.jit(glv.double_scalar_mult_basepoint)(
        plane(u1s), plane(u2s), pp2)
    got = affine_of(res.x, res.y, res.z)
    want = [hc.add(hc.mul(a, hc.G), hc.mul(b, p))
            for a, b, p in zip(u1s, u2s, basep)]
    check("dsmb_fused_tail", got == want)

    # Fused Pippenger bucket accumulation (w=4, VMEM buckets) vs gold.
    from secp256k1_tpu.ops import msm as msmmod
    n_msm = 2048
    ks3 = [0, 1, hc.N - 1] + [R.randrange(hc.N) for _ in range(n_msm - 3)]
    pts3 = [hc.mul(R.randrange(1, hc.N), hc.G) for _ in range(n_msm)]
    import jax.numpy as jnp
    scal = jnp.asarray(lb.int_to_limbs_batch(ks3))
    ppts = ptmod.from_affine_ints(pts3)
    assert msmmod._fused_msm_ok(ppts, 4)
    want_msm = None
    for k, p in zip(ks3, pts3):
        want_msm = hc.add(want_msm, hc.mul(k, p))

    def msm_affine(res):
        rx = lb.limbs_to_int(np.asarray(res.x).reshape(16))
        ry = lb.limbs_to_int(np.asarray(res.y).reshape(16))
        rz = lb.limbs_to_int(np.asarray(res.z).reshape(16))
        if rz == 0:
            return None
        zinv = pow(rz, P - 2, P)
        return (rx * zinv % P, ry * zinv % P)

    for wb, tag in ((4, "w4"), (6, "w6_signed")):
        res = jax.jit(
            lambda k, p, wb=wb: msmmod.multi_scalar_mult(k, p, wb))(
                scal, ppts)
        check(f"msm_bucket_accumulate_{tag}",
              msm_affine(res) == (want_msm[:2] if want_msm else None))

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    if out_path:
        import json
        import datetime
        with open(out_path, "w") as f:
            json.dump({"results": RESULTS, "failed": FAILED,
                       "backend": jax.devices()[0].platform,
                       "device": str(jax.devices()[0]),
                       "date": datetime.date.today().isoformat()},
                      f, indent=1)
    if FAILED:
        print("FAILED:", FAILED)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
