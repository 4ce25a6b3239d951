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
