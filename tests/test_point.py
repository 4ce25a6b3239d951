"""Curve group law + differential tests vs the Python-int affine oracle.

Mirrors `/root/reference/point_test.go:136-416`: group laws, complete-formula
edge cases (identity, doubling via add, inverses), the trivial-ladder
differential oracle, and Z-randomization so non-normalized projective inputs
are covered.
"""

import numpy as np
import jax.numpy as jnp

import gold
from helpers import as_batch, from_batch, jitted, rng
from secp256k1_tpu.ops import field as fe
from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops import point as pt

RNG = rng(77)
B = 32


def rand_affine_points(n):
    """n random curve points as (int, int) via k*G in the gold oracle."""
    return [gold.affine_mul(RNG.randrange(1, gold.N), gold.GEN)
            for _ in range(n)]


def to_batch_point(pairs, randomize_z=False):
    p = pt.from_affine_ints(pairs)
    if randomize_z:
        zs = [RNG.randrange(1, gold.P) for _ in pairs]
        zb = jnp.asarray(lb.int_to_limbs_batch(zs))
        p = pt.Point(fe.mul(p.x, zb), fe.mul(p.y, zb), zb)
    return p


def affine_ints(p: pt.Point):
    """Device point batch -> list of (x, y) ints / None for identity."""
    aff = jitted(pt.to_affine)(p)
    xs = from_batch(aff.x)
    ys = from_batch(aff.y)
    ident = list(np.asarray(jitted(pt.is_identity)(p)))
    return [None if i else (x, y) for x, y, i in zip(xs, ys, ident)]


def test_add_matches_gold():
    a = rand_affine_points(B)
    b = rand_affine_points(B)
    pa = to_batch_point(a, randomize_z=True)
    pb = to_batch_point(b, randomize_z=True)
    got = affine_ints(jitted(pt.add)(pa, pb))
    want = [gold.affine_add(x, y) for x, y in zip(a, b)]
    assert got == want


def test_add_identity_and_inverse():
    a = rand_affine_points(8)
    pa = to_batch_point(a, randomize_z=True)
    ident = pt.identity((8,))
    # a + 0 = a ; 0 + a = a
    assert affine_ints(jitted(pt.add)(pa, ident)) == a
    assert affine_ints(jitted(pt.add)(ident, pa)) == a
    # a + (-a) = 0
    got = affine_ints(jitted(pt.sub)(pa, pa))
    assert got == [None] * 8
    # 0 + 0 = 0
    assert affine_ints(jitted(pt.add)(ident, ident)) == [None] * 8


def test_add_equals_double():
    a = rand_affine_points(B)
    pa = to_batch_point(a, randomize_z=True)
    via_add = affine_ints(jitted(pt.add)(pa, pa))
    via_dbl = affine_ints(jitted(pt.double)(pa))
    want = [gold.affine_double(x) for x in a]
    assert via_add == want
    assert via_dbl == want


def test_double_identity():
    got = affine_ints(jitted(pt.double)(pt.identity((4,))))
    assert got == [None] * 4


def test_add_mixed_matches_complete():
    a = rand_affine_points(B)
    b = rand_affine_points(B)
    pa = to_batch_point(a, randomize_z=True)
    qx = jnp.asarray(lb.int_to_limbs_batch([p[0] for p in b]))
    qy = jnp.asarray(lb.int_to_limbs_batch([p[1] for p in b]))
    got = affine_ints(jitted(pt.add_mixed)(pa, qx, qy))
    want = [gold.affine_add(x, y) for x, y in zip(a, b)]
    assert got == want
    # mixed add with p = identity must still work (q affine, p = infinity)
    got2 = affine_ints(jitted(pt.add_mixed)(pt.identity((B,)), qx, qy))
    assert got2 == b


def test_commutativity_and_assoc():
    a = rand_affine_points(B)
    b = rand_affine_points(B)
    c = rand_affine_points(B)
    pa, pb, pc = (to_batch_point(v, randomize_z=True) for v in (a, b, c))
    ab_c = jitted(pt.add)(jitted(pt.add)(pa, pb), pc)
    a_bc = jitted(pt.add)(pa, jitted(pt.add)(pb, pc))
    ba_c = jitted(pt.add)(jitted(pt.add)(pb, pa), pc)
    assert affine_ints(ab_c) == affine_ints(a_bc) == affine_ints(ba_c)
    assert np.all(np.asarray(jitted(pt.equal)(ab_c, a_bc)))


def test_equal_identity_vs_point():
    a = rand_affine_points(4)
    pa = to_batch_point(a, randomize_z=True)
    ident = pt.identity((4,))
    assert not np.any(np.asarray(jitted(pt.equal)(pa, ident)))
    assert np.all(np.asarray(jitted(pt.equal)(ident, ident)))


def test_on_curve():
    a = rand_affine_points(8)
    pa = to_batch_point(a, randomize_z=True)
    assert np.all(np.asarray(jitted(pt.on_curve)(pa)))
    assert np.all(np.asarray(jitted(pt.on_curve)(pt.identity((3,)))))
    bad = pt.Point(pa.x, fe.add(pa.y, fe.one((8,))), pa.z)
    assert not np.any(np.asarray(jitted(pt.on_curve)(bad)))


def test_ladder_vs_gold():
    ks = [0, 1, 2, 3, gold.N - 1, gold.N - 2, 2**128,
          RNG.randrange(gold.N), RNG.randrange(gold.N), RNG.randrange(gold.N)]
    base = rand_affine_points(len(ks))
    pb = to_batch_point(base, randomize_z=True)
    kb = as_batch(ks)
    got = affine_ints(jitted(pt.scalar_mult_trivial)(kb, pb))
    want = [gold.affine_mul(k, b) for k, b in zip(ks, base)]
    assert got == want


def test_generator():
    g = pt.generator((2,))
    assert np.all(np.asarray(jitted(pt.on_curve)(g)))
    got = affine_ints(g)
    assert got == [gold.GEN, gold.GEN]


def test_is_y_odd():
    a = rand_affine_points(16)
    pa = to_batch_point(a, randomize_z=True)
    got = list(np.asarray(jitted(pt.is_y_odd)(pa)))
    assert got == [bool(p[1] & 1) for p in a]
