"""RFC 9380 hash-to-curve suites, batched.

Mirrors `/root/reference/secec/h2c/h2c.go:25-63` and
`h2c_expand_message.go:27-139`: suites `secp256k1_XMD:SHA-256_SSWU_RO_` and
`_NU_` over `expand_message_xmd` (host-side SHA-256 block chain, including
the oversize-DST reduction and edge-case rejections), with the SWU map and
point addition batched on device.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np

from ..ops import field as fe
from ..ops import point as pt
from ..ops import swu
from ..utils import batching as bt
from ..utils import config as cfg

_H_OUT = 32   # SHA-256 output
_H_BLOCK = 64  # SHA-256 block
_MAX_DST = 255
_OVERSIZE_PREFIX = b"H2C-OVERSIZE-DST-"


def expand_message_xmd(msg: bytes, dst: bytes, n_out: int) -> bytes:
    """RFC 9380 §5.3.1 expand_message_xmd with SHA-256.

    Host-side sequential hashing (`h2c_expand_message.go:27-139`), including
    long-DST hashing and the ell > 255 / len_in_bytes > 65535 rejections."""
    if len(dst) == 0:
        raise ValueError("empty DST")
    if len(dst) > _MAX_DST:
        dst = hashlib.sha256(_OVERSIZE_PREFIX + dst).digest()
    ell = (n_out + _H_OUT - 1) // _H_OUT
    if ell > 255 or n_out > 65535:
        raise ValueError("invalid expand_message_xmd length")
    dst_prime = dst + bytes([len(dst)])
    z_pad = b"\x00" * _H_BLOCK
    l_i_b_str = n_out.to_bytes(2, "big")
    b0 = hashlib.sha256(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    out = b1
    b_prev = b1
    for i in range(2, ell + 1):
        strxor = bytes(x ^ y for x, y in zip(b0, b_prev))
        b_prev = hashlib.sha256(strxor + bytes([i]) + dst_prime).digest()
        out += b_prev
    return out[:n_out]


def expand_message_xmd_batch(msgs: np.ndarray, dst: bytes,
                             n_out: int) -> np.ndarray:
    """Vectorized expand_message_xmd over uniform-length messages.

    msgs: [n, L] u8.  One native `sha256_batch` call per hash stage
    (1 + ell calls total) instead of n×(1 + ell) sequential hashes; falls
    back to the per-lane path without the C++ library.  Bit-exact with
    `expand_message_xmd` (differentially tested)."""
    from .. import native
    n = msgs.shape[0]
    if not native.available():
        return np.stack([np.frombuffer(
            expand_message_xmd(m.tobytes(), dst, n_out), np.uint8)
            for m in msgs])
    if len(dst) == 0:
        raise ValueError("empty DST")
    if len(dst) > _MAX_DST:
        dst = hashlib.sha256(_OVERSIZE_PREFIX + dst).digest()
    ell = (n_out + _H_OUT - 1) // _H_OUT
    if ell > 255 or n_out > 65535:
        raise ValueError("invalid expand_message_xmd length")
    dst_prime = np.frombuffer(dst + bytes([len(dst)]), np.uint8)
    dp = np.broadcast_to(dst_prime, (n, dst_prime.shape[0]))

    def rows(val: bytes):
        return np.broadcast_to(np.frombuffer(val, np.uint8), (n, len(val)))

    b0 = native.sha256_batch(np.concatenate(
        [rows(b"\x00" * _H_BLOCK), msgs,
         rows(n_out.to_bytes(2, "big") + b"\x00"), dp], axis=1))
    blocks = []
    prev = native.sha256_batch(np.concatenate([b0, rows(b"\x01"), dp], 1))
    blocks.append(prev)
    for i in range(2, ell + 1):
        prev = native.sha256_batch(np.concatenate(
            [b0 ^ prev, rows(bytes([i])), dp], axis=1))
        blocks.append(prev)
    return np.concatenate(blocks, axis=1)[:, :n_out]


@jax.jit
def _ro_core(u0_bytes, u1_bytes):
    """Two SWU maps + complete add, batched."""
    q0 = swu.set_uniform_bytes(u0_bytes)
    q1 = swu.set_uniform_bytes(u1_bytes)
    p = pt.add(q0, q1)
    aff = pt.to_affine(p)
    return aff.x, aff.y, pt.is_identity(p)


@jax.jit
def _nu_core(u_bytes):
    q = swu.set_uniform_bytes(u_bytes)
    aff = pt.to_affine(q)
    return aff.x, aff.y, pt.is_identity(q)


def _from_planes(x, y, ident, n):
    xs = bt.unplane_ints(x, n)
    ys = bt.unplane_ints(y, n)
    idents = bt.unplane_flags(ident, n)
    return [None if i else (a, b) for a, b, i in zip(xs, ys, idents)]


def hash_to_curve_batch(msgs, dst: bytes,
                        batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """secp256k1_XMD:SHA-256_SSWU_RO_ for a batch of messages.

    Returns a list of affine (x, y) int pairs (or None for the
    astronomically-unlikely identity)."""
    n = len(msgs)
    b = bt.bucket(n)
    u0s, u1s = [], []
    for m in msgs:
        uniform = expand_message_xmd(m, dst, 96)
        u0s.append(uniform[:48])
        u1s.append(uniform[48:])
    x, y, ident = _ro_core(bt.byte_plane(u0s, b, fill=b"\x00" * 48),
                           bt.byte_plane(u1s, b, fill=b"\x00" * 48))
    return _from_planes(x, y, ident, n)


def encode_to_curve_batch(msgs, dst: bytes,
                          batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """secp256k1_XMD:SHA-256_SSWU_NU_ (non-uniform, single map)."""
    n = len(msgs)
    b = bt.bucket(n)
    us = [expand_message_xmd(m, dst, 48) for m in msgs]
    x, y, ident = _nu_core(bt.byte_plane(us, b, fill=b"\x00" * 48))
    return _from_planes(x, y, ident, n)


@jax.jit
def _ro_bytes_core(u0_bytes, u1_bytes):
    q0 = swu.set_uniform_bytes(u0_bytes)
    q1 = swu.set_uniform_bytes(u1_bytes)
    p = pt.add(q0, q1)
    aff = pt.to_affine(p)
    return fe.to_bytes(aff.x), fe.to_bytes(aff.y), pt.is_identity(p)


@jax.jit
def _nu_bytes_core(u_bytes):
    q = swu.set_uniform_bytes(u_bytes)
    aff = pt.to_affine(q)
    return fe.to_bytes(aff.x), fe.to_bytes(aff.y), pt.is_identity(q)


def _h2c_arrays(msgs: np.ndarray, dst: bytes, random_oracle: bool):
    n = msgs.shape[0]
    b = bt.bucket(n)
    if random_oracle:
        uniform = expand_message_xmd_batch(msgs, dst, 96)
        xb, yb, ident = _ro_bytes_core(
            bt.byte_plane_np(np.ascontiguousarray(uniform[:, :48]), b),
            bt.byte_plane_np(np.ascontiguousarray(uniform[:, 48:]), b))
    else:
        uniform = expand_message_xmd_batch(msgs, dst, 48)
        xb, yb, ident = _nu_bytes_core(bt.byte_plane_np(uniform, b))
    xs = np.asarray(xb).astype(np.uint8).reshape(32, -1)[:, :n].T
    ys = np.asarray(yb).astype(np.uint8).reshape(32, -1)[:, :n].T
    out = np.concatenate([xs, ys], axis=1)
    return out, np.asarray(ident).reshape(-1)[:n]


def hash_to_curve_batch_arrays(msgs: np.ndarray, dst: bytes):
    """secp256k1_XMD:SHA-256_SSWU_RO_ on numpy arrays — the
    zero-per-lane-Python throughput path.

    msgs: [n, L] u8 (uniform length).  Host work is 1 + ell batched C++
    SHA-256 calls; both SWU maps and the add run on device.  Returns
    (points [n, 64] u8 affine x||y, is_identity [n] bool)."""
    return _h2c_arrays(msgs, dst, random_oracle=True)


def encode_to_curve_batch_arrays(msgs: np.ndarray, dst: bytes):
    """secp256k1_XMD:SHA-256_SSWU_NU_ on numpy arrays (single map)."""
    return _h2c_arrays(msgs, dst, random_oracle=False)


def hash_to_curve(msg: bytes, dst: bytes):
    return hash_to_curve_batch([msg], dst)[0]


def encode_to_curve(msg: bytes, dst: bytes):
    return encode_to_curve_batch([msg], dst)[0]
