"""GLV endomorphism scalar multiplication, batched.

TPU redesign of `/root/reference/point_mul_glv.go`: the same balanced
length-two decomposition (libsecp256k1's g1/g2 precomputed-division variant
of HMV Alg 3.74), but every step — 512-bit schoolbook multiply, floored
division by 2^384, scalar recombination, conditional negation, windowed
double-and-add with masked table lookups — runs branch-free over the whole
batch.  The reference's vartime early-exits (`point_mul_glv.go:203-254`) are
deliberately replaced by a uniform schedule: batches amortize the constant
work, and uniform schedules are what vectorize (SURVEY.md §7 stance 3).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import field as fe
from . import limbs as lb
from . import point as pt
from . import scalar as sc
from . import table as tbl

# Constants from the GLV literature for secp256k1 (public domain parameters,
# also used at `/root/reference/point_mul_glv.go:37-57`).
NEG_LAMBDA = 0xAC9C52B33FA3CF1F5AD9E3FD77ED9BA4A880B9FC8EC739C2E0CFC810B51283CF
BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
NEG_B1 = 0xE4437ED6010E88286F547FA90ABFE4C3
NEG_B2 = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE8A280AC50774346DD765CDA83DB1562C
G1 = 0x3086D221A7D46BCDE86C90E49284EB153DAA8A1471E8CA7FE893209A45DBB031
G2 = 0xE4437ED6010E88286F547FA90ABFE4C4221208AC9DF506C61571B4AE8AC47F71

_G1_LIMBS = lb.int_to_limbs(G1)
_G2_LIMBS = lb.int_to_limbs(G2)
_NEG_B1_LIMBS = lb.int_to_limbs(NEG_B1)
_NEG_B2_LIMBS = lb.int_to_limbs(NEG_B2)
_NEG_LAMBDA_LIMBS = lb.int_to_limbs(NEG_LAMBDA)


def _mul_g_floored_div(k, g_limbs):
    """floor(k * g / 2^384) + rounding bit — `mulGFlooredDiv`
    (`/root/reference/point_mul_glv.go:119-189`), in 16-bit limbs: the shift
    is a static limb slice, the rounding bit is bit 15 of limb 23."""
    wide = lb.mul_wide(k, jnp.broadcast_to(
        jnp.asarray(g_limbs, dtype=lb.DTYPE).reshape(
            (lb.NLIMBS,) + (1,) * (k.ndim - 1)), k.shape))
    hi = wide[24:32]                         # [8, *batch], value < 2^128
    round_bit = (wide[23] >> 15) & 1
    c = lb.carry_prop(lb.add_raw(hi, round_bit[None]), 9)
    pad = [(0, lb.NLIMBS - 9)] + [(0, 0)] * (c.ndim - 1)
    return jnp.pad(c, pad)                   # as a (reduced) scalar plane


def _mul_const_mod_n(a, c_limbs):
    """a * constant mod n (constant as limb vector)."""
    return lb.mod_fold(lb.mul_const(a, c_limbs), sc.S.c_limbs)


def split(k):
    """Balanced GLV split: k ≡ k1 + k2*lambda (mod n), |k1|,|k2| ~ 2^128.

    Returns (k1, k2) as canonical mod-n planes — `splitGLV`
    (`/root/reference/point_mul_glv.go:59-117`)."""
    c1 = _mul_g_floored_div(k, _G1_LIMBS)
    c2 = _mul_g_floored_div(k, _G2_LIMBS)
    k2 = sc.add(_mul_const_mod_n(c1, _NEG_B1_LIMBS),
                _mul_const_mod_n(c2, _NEG_B2_LIMBS))
    k1 = sc.add(k, _mul_const_mod_n(k2, _NEG_LAMBDA_LIMBS))
    return k1, k2


def mul_beta(p: pt.Point) -> pt.Point:
    """The curve endomorphism phi(x, y) = (beta*x, y)
    (`/root/reference/point_mul_glv.go:191`)."""
    beta = fe.const(BETA, p.x.shape[1:])
    return pt.Point(fe.mul(p.x, beta), p.y, p.z)


def _nibble_digits_128(k):
    """Low 128 bits of a scalar plane -> [32, *batch] nibble digits,
    most-significant first."""
    digs = []
    for i in range(31, -1, -1):
        limb = i // 4
        shift = (i % 4) * 4
        digs.append((k[limb] >> shift) & 0xF)
    return jnp.stack(digs, axis=0)


def _signed_digits_128(k):
    """Low 128 bits -> [33, *batch] signed-window digits, most-significant
    first.  Each u32 encodes magnitude (low 4 bits, in [0, 8]) and sign
    (bit 4); digit value = (-1)^sign * magnitude.  Standard branch-free
    recoding: d in [9, 16] becomes d - 16 with carry 1 into the next window,
    so the lookup table only needs the 8 positive multiples (negation is a
    cheap y-negate) — half the table build and scan of the unsigned form."""
    digs = []                                # ls-first for the carry scan
    for i in range(32):
        limb = i // 4
        shift = (i % 4) * 4
        digs.append((k[limb] >> shift) & 0xF)
    d = jnp.stack(digs, axis=0)

    def body(c, di):
        t = di + c
        neg = t > 8                          # t in [0, 16]
        mag = jnp.where(neg, jnp.uint32(16) - t, t)   # t=16 -> mag 0
        out = mag | (neg.astype(jnp.uint32) << 4)
        return neg.astype(jnp.uint32), out

    carry, outs = lax.scan(body, jnp.zeros_like(d[0]), d)
    outs = jnp.concatenate([outs, carry[None]], axis=0)  # [33], ls-first
    return outs[::-1]


def scalar_mult(k, p: pt.Point) -> pt.Point:
    """k*P via GLV: split, conditional negation to short scalars, two 15-entry
    lane tables, 32 windows x (4 doublings + 2 masked lookup-adds).

    Uniform-schedule batched version of both `ScalarMult`
    (`/root/reference/point_mul_glv.go:257-303`) and its vartime twin."""
    k1, k2 = split(k)
    neg1 = sc.is_greater_than_half_n(k1)
    neg2 = sc.is_greater_than_half_n(k2)
    k1 = sc.cneg(neg1, k1)
    k2 = sc.cneg(neg2, k2)
    p1 = pt.cneg(neg1, p)
    p2 = pt.cneg(neg2, mul_beta(p))

    def _fused_ok():
        from . import pallas
        if not pallas.enabled():
            return False
        from .pallas import kernels as pk
        return k.ndim == 3 and pk.compatible_shape(p.x)

    if _fused_ok():
        from .pallas import kernels as pk
        if pk.mega_enabled():
            # The whole double-and-add loop is ONE Pallas launch; the lane
            # tables are built in VMEM scratch inside the kernel (no table
            # HBM traffic, no build launches) and stay resident across all
            # windows.  Signed digits halve the table (8 entries).
            if pk.mega_signed_enabled():
                s1 = _signed_digits_128(k1)  # [33, *batch], ms-first
                s2 = _signed_digits_128(k2)
                x, y, z = pk.glv_windowed_mult_signed_from_points(
                    s1, s2, (p1.x, p1.y, p1.z), (p2.x, p2.y, p2.z))
            else:
                d1u = _nibble_digits_128(k1)
                d2u = _nibble_digits_128(k2)
                x, y, z = pk.glv_windowed_mult_from_points(
                    d1u, d2u, (p1.x, p1.y, p1.z), (p2.x, p2.y, p2.z))
            return pt.Point(x, y, z)

    d1 = _nibble_digits_128(k1)              # [32, *batch], ms-first
    d2 = _nibble_digits_128(k2)

    if _fused_ok():
        from .pallas import kernels as pk

        t1 = tbl.build_lane_table(p1)        # [15, 3, 16, *batch]
        t2 = tbl.build_lane_table(p2)

        def fused_body(acc, xs):
            dig1, dig2 = xs
            acc = pt.double_n(acc, 4)
            # One fused kernel per table: masked select + add + digit-0
            # passthrough, streaming the per-lane table through VMEM once.
            acc = pt.Point(*pk.point_lookup_add(
                acc.x, acc.y, acc.z, t1, dig1))
            acc = pt.Point(*pk.point_lookup_add(
                acc.x, acc.y, acc.z, t2, dig2))
            return acc, None

        acc, _ = lax.scan(fused_body, pt.identity(k.shape[1:]), (d1, d2))
        return acc

    t1 = tbl.build_lane_table(p1)            # [15, 3, 16, *batch]
    t2 = tbl.build_lane_table(p2)

    def body(acc, xs):
        dig1, dig2 = xs
        acc = pt.double_n(acc, 4)            # identity doubles to identity
        q1 = tbl.lookup_lane_table(t1, dig1)
        acc = pt.select(dig1 == 0, acc, pt.add(acc, q1))
        q2 = tbl.lookup_lane_table(t2, dig2)
        acc = pt.select(dig2 == 0, acc, pt.add(acc, q2))
        return acc, None

    acc, _ = lax.scan(body, pt.identity(k.shape[1:]), (d1, d2))
    return acc


def double_scalar_mult_basepoint(u1, u2, p: pt.Point,
                                 base_window_bits: int = 8) -> pt.Point:
    """u1*G + u2*P — the ECDSA-verify core
    (`/root/reference/point_mul_glv.go:307-317`): GLV for the P term, then
    fixed-base tables for the G term (zero doublings) with the final
    complete add fused into the accumulation launch."""
    u2p = scalar_mult(u2, p)
    return tbl.scalar_base_mult_add(u1, u2p, base_window_bits)
