"""Batched secp256k1 curve group: complete projective formulas on limb planes.

TPU-native equivalent of the reference's point layer
(`/root/reference/point.go:24-238`, `point_projective.go:24-302`): points are
projective (X, Y, Z) with x = X/Z, y = Y/Z, identity = (0, 1, 0), using the
complete addition/doubling formulas of Renes–Costello–Batina 2015
(Algorithms 7/8/9 specialized to a = 0, b3 = 3*7 = 21).  Completeness is what
makes *batched* arithmetic correct with zero per-lane branching: identity,
doubling and generic cases all flow through the same kernel (SURVEY.md §7
stance 4).

A point batch is a NamedTuple of three [16, *batch] u32 limb planes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import field as fe
from . import limbs as lb

B3 = 21  # 3*b for y^2 = x^3 + 7

GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


class Point(NamedTuple):
    """Batch of projective points; each field is a [16, *batch] u32 plane."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


class AffinePoint(NamedTuple):
    """Batch of affine points (no identity representation)."""
    x: jnp.ndarray
    y: jnp.ndarray


def identity(batch_shape=()):
    """The neutral element (0, 1, 0) (`/root/reference/point.go:42`)."""
    return Point(fe.zero(batch_shape), fe.one(batch_shape), fe.zero(batch_shape))


def generator(batch_shape=()):
    return Point(fe.const(GX, batch_shape), fe.const(GY, batch_shape),
                 fe.one(batch_shape))


def from_affine_ints(pairs):
    """Host helper: list of (x, y) int pairs -> Point batch [16, len]."""
    xs = lb.int_to_limbs_batch([p[0] for p in pairs])
    ys = lb.int_to_limbs_batch([p[1] for p in pairs])
    b = len(pairs)
    return Point(jnp.asarray(xs), jnp.asarray(ys),
                 fe.one((b,)))


def _pallas_ok(*arrs) -> bool:
    from . import pallas
    if not pallas.enabled():
        return False
    from .pallas import kernels as pk
    return pk.compatible_shape(*arrs)


def _maybe_pallas(op_name: str, planes):
    """Run a fused point kernel if Pallas is enabled, padding arbitrary
    batch shapes up to the tiled [16, S, 128] layout when needed.

    Small/odd batches (single points in window folds, bucket arrays, ...)
    would otherwise fall back to the jnp path, which on TPU costs
    milliseconds per op; a padded kernel launch costs ~tens of µs.
    Returns None when Pallas is disabled.
    """
    from . import pallas
    if not pallas.enabled():
        return None
    from .pallas import kernels as pk
    if pk.compatible_shape(*planes):
        return getattr(pk, op_name)(*planes)
    x0 = planes[0]
    batch = x0.shape[1:]
    bsize = 1
    for d in batch:
        bsize *= d
    padded = ((bsize + 1023) // 1024) * 1024

    def prep(p):
        f = p.reshape(16, bsize)
        if padded != bsize:
            f = jnp.pad(f, ((0, 0), (0, padded - bsize)))
        return f.reshape(16, padded // 128, 128)

    outs = getattr(pk, op_name)(*[prep(p) for p in planes])

    def unprep(o):
        return o.reshape(16, padded)[:, :bsize].reshape((16,) + batch)

    if isinstance(outs, (tuple, list)):
        return tuple(unprep(o) for o in outs)
    return unprep(outs)


def add(p: Point, q: Point) -> Point:
    """Complete projective addition, RCB 2015 Algorithm 7 (a=0).

    12M + 2*m21 + 19a; handles identity/doubling/negation cases uniformly
    (`/root/reference/point_projective.go:24-120`).  On TPU with the
    [16, S, 128] layout this is a single fused Pallas kernel.
    """
    out = _maybe_pallas("point_add", (p.x, p.y, p.z, q.x, q.y, q.z))
    if out is not None:
        return Point(*out)
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = fe.mul(x1, x2)
    t1 = fe.mul(y1, y2)
    t2 = fe.mul(z1, z2)
    t3 = fe.add(x1, y1)
    t4 = fe.add(x2, y2)
    t3 = fe.mul(t3, t4)
    t4 = fe.add(t0, t1)
    t3 = fe.sub(t3, t4)
    t4 = fe.add(y1, z1)
    x3 = fe.add(y2, z2)
    t4 = fe.mul(t4, x3)
    x3 = fe.add(t1, t2)
    t4 = fe.sub(t4, x3)
    x3 = fe.add(x1, z1)
    y3 = fe.add(x2, z2)
    x3 = fe.mul(x3, y3)
    y3 = fe.add(t0, t2)
    y3 = fe.sub(x3, y3)
    x3 = fe.add(t0, t0)
    t0 = fe.add(x3, t0)
    t2 = fe.mul_word(t2, B3)
    z3 = fe.add(t1, t2)
    t1 = fe.sub(t1, t2)
    y3 = fe.mul_word(y3, B3)
    x3 = fe.mul(t4, y3)
    t2 = fe.mul(t3, t1)
    x3 = fe.sub(t2, x3)
    y3 = fe.mul(y3, t0)
    t1 = fe.mul(t1, z3)
    y3 = fe.add(t1, y3)
    t0 = fe.mul(t0, t3)
    z3 = fe.mul(z3, t4)
    z3 = fe.add(z3, t0)
    return Point(x3, y3, z3)


def add_mixed(p: Point, qx, qy) -> Point:
    """Mixed addition (Z2 = 1), RCB 2015 Algorithm 8: 11M + 2*m21 + 13a.

    CANNOT accept the identity as the affine addend (q must be a real affine
    point); p may be anything (`/root/reference/point_projective.go:123-205`).
    Callers doing table lookups mask out the digit-0 case with `select`, the
    same fixup the reference does (`point_mul_table.go:118-129`).
    """
    out = _maybe_pallas("point_add_mixed", (p.x, p.y, p.z, qx, qy))
    if out is not None:
        return Point(*out)
    x1, y1, z1 = p
    x2, y2 = qx, qy
    t0 = fe.mul(x1, x2)
    t1 = fe.mul(y1, y2)
    t3 = fe.add(x2, y2)
    t4 = fe.add(x1, y1)
    t3 = fe.mul(t3, t4)
    t4 = fe.add(t0, t1)
    t3 = fe.sub(t3, t4)
    t4 = fe.mul(y2, z1)
    t4 = fe.add(t4, y1)
    y3 = fe.mul(x2, z1)
    y3 = fe.add(y3, x1)
    x3 = fe.add(t0, t0)
    t0 = fe.add(x3, t0)
    t2 = fe.mul_word(z1, B3)
    z3 = fe.add(t1, t2)
    t1 = fe.sub(t1, t2)
    y3 = fe.mul_word(y3, B3)
    x3 = fe.mul(t4, y3)
    t2 = fe.mul(t3, t1)
    x3 = fe.sub(t2, x3)
    y3 = fe.mul(y3, t0)
    t1 = fe.mul(t1, z3)
    y3 = fe.add(t1, y3)
    t0 = fe.mul(t0, t3)
    z3 = fe.mul(z3, t4)
    z3 = fe.add(z3, t0)
    return Point(x3, y3, z3)


def double(p: Point) -> Point:
    """Complete doubling, RCB 2015 Algorithm 9 (a=0): 6M + 2S + 1*m21 + 9a
    (`/root/reference/point_projective.go:208-273`)."""
    out = _maybe_pallas("point_double", (p.x, p.y, p.z))
    if out is not None:
        return Point(*out)
    x, y, z = p
    t0 = fe.square(y)
    z3 = fe.add(t0, t0)
    z3 = fe.add(z3, z3)
    z3 = fe.add(z3, z3)
    t1 = fe.mul(y, z)
    t2 = fe.square(z)
    t2 = fe.mul_word(t2, B3)
    x3 = fe.mul(t2, z3)
    y3 = fe.add(t0, t2)
    z3 = fe.mul(t1, z3)
    t1 = fe.add(t2, t2)
    t2 = fe.add(t1, t2)
    t0 = fe.sub(t0, t2)
    y3 = fe.mul(t0, y3)
    y3 = fe.add(x3, y3)
    t1 = fe.mul(x, y)
    x3 = fe.mul(t0, t1)
    x3 = fe.add(x3, x3)
    return Point(x3, y3, z3)


def double_n(p: Point, n: int) -> Point:
    """n consecutive doublings; on the Pallas path multiples of 4 use the
    fused 4-double kernel (one HBM round-trip per 4)."""
    if n % 4 == 0:
        done = True
        for _ in range(n // 4):
            out = _maybe_pallas("point_double4", (p.x, p.y, p.z))
            if out is None:
                done = False
                break
            p = Point(*out)
        if done:
            return p
    for _ in range(n):
        p = double(p)
    return p


def negate(p: Point) -> Point:
    return Point(p.x, fe.neg(p.y), p.z)


def cneg(mask, p: Point) -> Point:
    """Negate lanes where mask (branchless)."""
    return Point(p.x, fe.cneg(mask, p.y), p.z)


def select(mask, p: Point, q: Point) -> Point:
    """Per-lane select: mask ? p : q."""
    return Point(fe.select(mask, p.x, q.x),
                 fe.select(mask, p.y, q.y),
                 fe.select(mask, p.z, q.z))


def sub(p: Point, q: Point) -> Point:
    return add(p, negate(q))


def equal(p: Point, q: Point):
    """Projective cross-multiplied equality (`/root/reference/point.go:137`)."""
    ex = fe.eq(fe.mul(p.x, q.z), fe.mul(q.x, p.z))
    ey = fe.eq(fe.mul(p.y, q.z), fe.mul(q.y, p.z))
    return ex & ey


def is_identity(p: Point):
    return fe.is_zero(p.z)


def to_affine(p: Point) -> AffinePoint:
    """Normalize to affine; identity lanes map to (0, 0) since
    Invert(0) = 0 — the reference's rescale
    (`/root/reference/point_projective.go:278-302`) amortized over the batch
    via Montgomery batch inversion (one Fermat chain + ~3B muls,
    SURVEY.md §7 hard-part 5) once the batch is big enough to pay for the
    product tree."""
    bsize = 1
    for d in p.batch_shape:
        bsize *= d
    if bsize >= 4:
        zinv = fe.invert_batch(p.z)
    else:
        zinv = fe.invert(p.z)
    return AffinePoint(fe.mul(p.x, zinv), fe.mul(p.y, zinv))


def is_y_odd(p: Point):
    """Parity of the affine y (costs a rescale) (`point.go:158`)."""
    return fe.is_odd(to_affine(p).y)


def affine_y(p: Point):
    """Affine y only: one batched inversion + ONE mul (half the rescale
    muls of `to_affine` when x is not needed — the Schnorr verify tail
    pairs this with a projective x-compare).  Identity lanes map to 0."""
    bsize = 1
    for d in p.batch_shape:
        bsize *= d
    zinv = fe.invert_batch(p.z) if bsize >= 4 else fe.invert(p.z)
    return fe.mul(p.y, zinv)


def on_curve(p: Point):
    """Projective curve membership: Y^2 Z == X^3 + 7 Z^3 (identity passes)."""
    lhs = fe.mul(fe.square(p.y), p.z)
    z3 = fe.mul(fe.square(p.z), p.z)
    rhs = fe.add(fe.mul(fe.square(p.x), p.x), fe.mul_word(z3, 7))
    return fe.eq(lhs, rhs)


def debug_randomize_z(p: Point, z_vals) -> Point:
    """Test helper: multiply (X, Y, Z) by random nonzero factors so tests
    cover non-normalized projective representations — the analog of
    `DebugMustRandomizeZ` (`/root/reference/point_test.go:359-373`).
    z_vals: [16, *batch] nonzero field elements."""
    return Point(fe.mul(p.x, z_vals), fe.mul(p.y, z_vals),
                 fe.mul(p.z, z_vals))


def scalar_mult_trivial(k, p: Point) -> Point:
    """Naive 256-step double-and-add ladder — the differential test oracle,
    mirroring `scalarMultTrivial` (`/root/reference/point_test.go:392-416`).
    `k`: [16, *batch] scalar limb plane.  Uniform schedule, mask-selected."""
    def body(acc_base, i):
        acc, base = acc_base
        limb = i // 16
        bit = i % 16
        bitv = (lax.dynamic_index_in_dim(k, limb, axis=0, keepdims=False)
                >> bit) & 1
        acc = select(bitv == 1, add(acc, base), acc)
        base = double(base)
        return (acc, base), None

    init = (identity(p.batch_shape), p)
    (acc, _), _ = lax.scan(body, init, jnp.arange(256))
    return acc
