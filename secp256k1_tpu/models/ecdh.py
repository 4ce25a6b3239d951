"""Batched ECDH (SEC 1 §3.3.1): shared-secret x-coordinates.

The throughput path for the reference's `PrivateKey.ECDH`
(`/root/reference/secec/secec.go:53-56`): constant-schedule GLV ScalarMult
over the whole batch, one shared inversion for the rescale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as fe
from ..ops import glv
from ..ops import limbs as lb
from ..ops import point as pt
from ..ops import s11n
from ..ops import scalar as sc
from ..utils import batching as bt
from ..utils import config as cfg
from ..utils import errors as ec
from ..utils import hostcurve as hc


@jax.jit
def _ecdh_core(k, px, py):
    p = pt.Point(px, py, fe.one(px.shape[1:]))
    shared = glv.scalar_mult(k, p)
    aff = pt.to_affine(shared)
    return fe.to_bytes(aff.x), pt.is_identity(shared)


def ecdh_batch(privs, pubs, batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Shared secrets for pairs (privs[i], pubs[i]); returns [bytes]."""
    n = len(privs)
    b = bt.bucket(n)
    k = bt.plane([p.scalar for p in privs], b, fill=1)
    px = bt.plane([p.point[0] for p in pubs], b, fill=hc.GX)
    py = bt.plane([p.point[1] for p in pubs], b, fill=hc.GY)
    xb, ident = _ecdh_core(k, px, py)
    assert not any(bt.unplane_flags(ident, n)), "ECDH result is identity"
    return bt.unplane_bytes(xb, n)


@jax.jit
def _ecdh_e2e_core(k_bytes, want_odd, pub_x_bytes):
    """Fully device-side ECDH from raw byte planes: scalar canonicality,
    SEC1-compressed key lift, constant-schedule GLV ScalarMult and the
    affine x — zero per-lane host arithmetic.  Mirrors `NewPublicKey` +
    `PrivateKey.ECDH` (`/root/reference/secec/secec.go:53-56,83-118`)."""
    k = sc.S._bytes_to_limbs(k_bytes)
    bad_k = lb.geq_const(k, sc.S.m_limbs) | lb.is_zero(k)
    k_safe = lb.select(~bad_k, k, sc.one(k.shape[1:]))
    pub, pub_status = s11n.decompress(want_odd, pub_x_bytes)
    shared = glv.scalar_mult(k_safe, pub)
    ident = pt.is_identity(shared)
    aff = pt.to_affine(shared)
    st = jnp.where(
        pub_status != ec.OK, ec.ERR_INVALID_PUBLIC_KEY,
        jnp.where(bad_k, ec.ERR_INVALID_SCALAR,
                  jnp.where(ident, ec.ERR_INVALID_PUBLIC_KEY, ec.OK)))
    return fe.to_bytes(aff.x), st


def ecdh_batch_arrays(priv_bytes: np.ndarray, pubs_sec1: np.ndarray,
                      chunk_lanes: int | None = None):
    """End-to-end batched ECDH on numpy arrays — the zero-per-lane-Python
    throughput path.

    priv_bytes: [n, 32] u8 big-endian scalars; pubs_sec1: [n, 33] u8
    SEC1-compressed public keys.  Host work is the one-byte prefix check;
    decompression and the group math run on device.  Returns
    (shared [n, 32] u8 x-coordinates, status [n] int32); failed lanes get
    zeroed output.  chunk_lanes pipelines upload/compute like
    `ecdsa.verify_batch_arrays`.
    """
    n = priv_bytes.shape[0]
    assert priv_bytes.shape == (n, 32) and pubs_sec1.shape == (n, 33)
    prefix = pubs_sec1[:, 0]
    bad_prefix = (prefix != 0x02) & (prefix != 0x03)

    def dispatch(lo, hi):
        b = bt.bucket(hi - lo)
        want_odd = bt.scalar_plane(
            (prefix[lo:hi] == 0x03).astype(np.int32), b) != 0
        return _ecdh_e2e_core(
            bt.byte_plane_np(priv_bytes[lo:hi], b), want_odd,
            bt.byte_plane_np(pubs_sec1[lo:hi, 1:], b))

    chunk_lanes = bt.auto_chunk(n, chunk_lanes)
    if chunk_lanes is None or n <= chunk_lanes:
        spans = [(0, n)]
    else:
        spans = [(lo, min(lo + chunk_lanes, n))
                 for lo in range(0, n, chunk_lanes)]
    futures = [dispatch(lo, hi) for lo, hi in spans]
    shared = np.concatenate(
        [np.asarray(x).astype(np.uint8).reshape(32, -1)[:, :hi - lo].T
         for (x, _), (lo, hi) in zip(futures, spans)])
    status = np.concatenate(
        [np.asarray(st).reshape(-1)[:hi - lo]
         for (_, st), (lo, hi) in zip(futures, spans)]).astype(np.int32)
    status = np.where(bad_prefix, ec.ERR_INVALID_PUBLIC_KEY, status)
    shared[status != ec.OK] = 0
    return shared, status
