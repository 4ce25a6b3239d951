"""SEC 1 point serialization + public-key recovery, batched.

Device-side equivalent of `/root/reference/point_s11n.go:27-307`: strict
canonical compressed (33B) / uncompressed (65B) codecs, on-device batched
decompression (sqrt of x^3+7), x-only bytes, and `RecoverPoint` with the
recovery-ID contract (bit 0 = y parity, bit 1 = "x >= n" overflow).

Fixed-shape batching note: the reference's 1-byte identity encoding
(`point_s11n.go:27`) is variable-length; here device kernels use fixed 33/65
byte planes plus an `is_identity` mask, and the host key/codec layer
(models/codecs.py) renders the 1-byte form.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as fe
from . import limbs as lb
from . import point as pt
from . import scalar as sc
from ..utils import errors as ec


def decompress(want_odd, xbytes):
    """Batched SEC1 compressed decode (after the host strips the prefix).

    want_odd: [*batch] bool (prefix == 0x03); xbytes: [32, *batch] big-endian.
    Returns (Point, status) — status != OK where x is non-canonical or
    x^3 + 7 is not a QR (`/root/reference/point_s11n.go:140-172`)."""
    x, did_reduce = fe.from_bytes_any(xbytes)
    yy = fe.add(fe.mul(fe.square(x), x), fe.const(7, x.shape[1:]))
    y, ok = fe.sqrt(yy)
    y = fe.cneg(fe.is_odd(y) != want_odd, y)
    status = jnp.where(did_reduce, ec.ERR_INVALID_ENCODING,
                       jnp.where(~ok, ec.ERR_NOT_ON_CURVE, ec.OK))
    p = pt.Point(x, y, fe.one(x.shape[1:]))
    return p, status


def decode_uncompressed(xbytes, ybytes):
    """Batched SEC1 uncompressed decode: canonical x, y + curve membership
    (`/root/reference/point_s11n.go:174-241`)."""
    x, xred = fe.from_bytes_any(xbytes)
    y, yred = fe.from_bytes_any(ybytes)
    on = _xy_on_curve(x, y)
    status = jnp.where(xred | yred, ec.ERR_INVALID_ENCODING,
                       jnp.where(~on, ec.ERR_NOT_ON_CURVE, ec.OK))
    return pt.Point(x, y, fe.one(x.shape[1:])), status


def _xy_on_curve(x, y):
    """y^2 == x^3 + 7 (`/root/reference/point_s11n.go:298-307`)."""
    lhs = fe.square(y)
    rhs = fe.add(fe.mul(fe.square(x), x), fe.const(7, x.shape[1:]))
    return fe.eq(lhs, rhs)


def affine_bytes(p: pt.Point):
    """Rescale and serialize: returns (xbytes [32,*b], ybytes [32,*b],
    y_odd mask, is_identity mask).  One batched inversion for the whole
    batch — the reference pays a full Fermat inversion *per point*
    (`/root/reference/point_projective.go:278`)."""
    aff = pt.to_affine(p)
    return (fe.to_bytes(aff.x), fe.to_bytes(aff.y),
            fe.is_odd(aff.y), pt.is_identity(p))


def compressed_bytes(p: pt.Point):
    """Batched SEC1 compressed encoding: [33, *batch] byte plane + identity
    mask (identity lanes encode as a single 0x00 at the host boundary —
    `/root/reference/point_s11n.go:66-117`)."""
    xb, _, y_odd, is_ident = affine_bytes(p)
    prefix = jnp.where(y_odd, jnp.uint32(0x03), jnp.uint32(0x02))
    return jnp.concatenate([prefix[None], xb], axis=0), is_ident


def uncompressed_bytes(p: pt.Point):
    """Batched SEC1 uncompressed encoding: [65, *batch] byte plane +
    identity mask."""
    xb, yb, _, is_ident = affine_bytes(p)
    four = jnp.full((1,) + xb.shape[1:], 0x04, dtype=xb.dtype)
    return jnp.concatenate([four, xb, yb], axis=0), is_ident


def x_bytes(p: pt.Point):
    """Batched x-only encoding (`Point.XBytes`, `point_s11n.go:119-134`):
    [32, *batch] plane + identity mask (x of the identity is undefined)."""
    xb, _, _, is_ident = affine_bytes(p)
    return xb, is_ident


def recover_point(r_bytes, recovery_id):
    """Batched `RecoverPoint` (`/root/reference/point_s11n.go:245-282`).

    r_bytes: [32,*batch] big-endian scalar bytes (the ECDSA r, mod n
    canonical); recovery_id: [*batch] int32 in [0, 3]; bit 0 = y parity,
    bit 1 = add n to get the field x.  Status flags non-canonical r,
    x >= p after the n-add, or x^3+7 non-QR."""
    r_limbs = sc.S._bytes_to_limbs(r_bytes)
    r_ok = ~lb.geq_const(r_limbs, sc.S.m_limbs)
    nonzero = ~lb.is_zero(r_limbs)

    overflow = (recovery_id & 2) != 0
    # x = r + n (as integers); must stay < p.
    n17 = lb.add(r_limbs, jnp.broadcast_to(
        jnp.asarray(lb.int_to_limbs(sc.N), dtype=lb.DTYPE).reshape(
            (16,) + (1,) * (r_limbs.ndim - 1)), r_limbs.shape), 17)
    p17 = lb.int_to_limbs(fe.P, 17)
    fits = ~lb.geq_const(n17, p17)
    x = jnp.where(overflow[None], n17[:16], r_limbs)

    yy = fe.add(fe.mul(fe.square(x), x), fe.const(7, x.shape[1:]))
    y, is_qr = fe.sqrt(yy)
    want_odd = (recovery_id & 1) != 0
    y = fe.cneg(fe.is_odd(y) != want_odd, y)

    bad_id = (recovery_id < 0) | (recovery_id > 3)
    ok = r_ok & nonzero & is_qr & (fits | ~overflow)
    status = jnp.where(bad_id, ec.ERR_INVALID_RECOVERY_ID,
                       jnp.where(~ok, ec.ERR_INVALID_ENCODING, ec.OK))
    return pt.Point(x, y, fe.one(x.shape[1:])), status
