"""MSM engines vs the gold oracle: Pippenger and Straus.

Mirrors `/root/reference/point_mul_multi_test.go:14-52` (sizes, identity
cases, consistency with per-point ScalarMult sums).
"""

import numpy as np

import gold
from helpers import as_batch, from_batch, jitted, rng
from secp256k1_tpu.ops import msm
from secp256k1_tpu.ops import point as pt

RNG = rng(1313)
N = gold.N


def setup(n):
    ks = [RNG.randrange(N) for _ in range(n)]
    pts = [gold.affine_mul(RNG.randrange(1, N), gold.GEN) for _ in range(n)]
    want = None
    for k, p in zip(ks, pts):
        want = gold.affine_add(want, gold.affine_mul(k, p))
    return ks, pts, want


def run_single(p: pt.Point):
    aff = jitted(pt.to_affine)(p)
    if bool(np.asarray(jitted(pt.is_identity)(p))):
        return None
    return (from_batch(aff.x.reshape(16, 1))[0],
            from_batch(aff.y.reshape(16, 1))[0])


def test_pippenger_small():
    for n in (1, 2, 32):
        ks, pts, want = setup(n)
        got = jitted(msm.multi_scalar_mult, 2)(
            as_batch(ks), pt.from_affine_ints(pts), 4)
        assert run_single(got) == want, n


def test_pippenger_zero_scalars():
    n = 8
    ks = [0] * n
    pts = [gold.affine_mul(i + 1, gold.GEN) for i in range(n)]
    got = jitted(msm.multi_scalar_mult, 2)(
        as_batch(ks), pt.from_affine_ints(pts), 4)
    assert bool(np.asarray(jitted(pt.is_identity)(got)))


def test_pippenger_repeated_digits():
    # All points share each digit value -> stress segmented sums.
    n = 16
    ks = [0x1111111111111111111111111111111111111111111111111111111111111111] * n
    ks[3] = 1
    ks[7] = N - 1
    pts = [gold.affine_mul(RNG.randrange(1, N), gold.GEN) for _ in range(n)]
    want = None
    for k, p in zip(ks, pts):
        want = gold.affine_add(want, gold.affine_mul(k, p))
    got = jitted(msm.multi_scalar_mult, 2)(
        as_batch(ks), pt.from_affine_ints(pts), 4)
    assert run_single(got) == want


def test_straus_matches():
    n = 8
    ks, pts, want = setup(n)
    got = jitted(msm.multi_scalar_mult_straus)(
        as_batch(ks), pt.from_affine_ints(pts))
    assert run_single(got) == want


def test_lane_merge_matches_gold():
    # _lane_merge reduces per-lane-slot partial buckets (the fused
    # bucket-accumulation kernel's output layout) with a batched add tree.
    import jax.numpy as jnp

    k, s = 3, 2                       # 3 buckets, 2*128 lane slots
    slots = s * 128
    pts = [[gold.affine_mul(RNG.randrange(1, N), gold.GEN)
            for _ in range(slots)] for _ in range(k)]
    planes = np.zeros((k, 3, 16, s, 128), dtype=np.uint32)
    for b in range(k):
        p = pt.from_affine_ints(pts[b])
        planes[b, 0] = np.asarray(p.x).reshape(16, s, 128)
        planes[b, 1] = np.asarray(p.y).reshape(16, s, 128)
        planes[b, 2] = np.asarray(p.z).reshape(16, s, 128)
    rows = jitted(msm._lane_merge)(jnp.asarray(planes))
    got = [run_single(pt.Point(rows[b, 0].reshape(16, 1),
                               rows[b, 1].reshape(16, 1),
                               rows[b, 2].reshape(16, 1))) for b in range(k)]
    want = []
    for b in range(k):
        acc = None
        for p in pts[b]:
            acc = gold.affine_add(acc, p)
        want.append(acc)
    assert got == want


def test_signed_digit_recoding_msm():
    # Generic signed-window recode: sum of (-1)^sign * mag * 2^(w*i) must
    # reproduce the scalar; magnitudes bounded by 2^(w-1).
    from secp256k1_tpu.ops import msm as msmmod

    ks = [0, 1, N - 1, 2**256 - 2**32 - 978, 0x3F3F3F3F] + \
        [RNG.randrange(N) for _ in range(5)]
    for w in (5, 6):
        digs = np.asarray(jitted(msmmod._signed_digits, 1)(as_batch(ks), w))
        half = 1 << (w - 1)
        for lane, k in enumerate(ks):
            total = 0
            for i in range(digs.shape[0]):           # ls window first
                d = int(digs[i, lane])
                mag, sign = d & 0x3F, d >> 6
                assert mag <= half and sign <= 1
                total += (-mag if sign else mag) << (w * i)
            assert total == k, (w, hex(k))
