"""Batched ECDH (SEC 1 §3.3.1): shared-secret x-coordinates.

The throughput path for the reference's `PrivateKey.ECDH`
(`/root/reference/secec/secec.go:53-56`): constant-schedule GLV ScalarMult
over the whole batch, one shared inversion for the rescale.
"""

from __future__ import annotations

import jax

from ..ops import field as fe
from ..ops import glv
from ..ops import point as pt
from ..utils import batching as bt
from ..utils import config as cfg
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
