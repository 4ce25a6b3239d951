"""BIP-0340 Schnorr signatures, batched.

Mirrors `/root/reference/secec/bitcoin/schnorr.go`: x-only keys (even-y
convention), tagged hashes, aux-rand nonce derivation, sign with mandatory
cheap self-verify via (s - d*e)*G, and batch verification R = s*G - e*P.
Tagged hashing stays host-side; every group operation runs batched on
device.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as fe
from ..ops import glv
from ..ops import point as pt
from ..ops import s11n
from ..ops import scalar as sc
from ..ops import table as tbl
from ..utils import batching as bt
from ..utils import config as cfg
from ..utils import errors as ec
from ..utils import hostcurve as hc

N = hc.N
P = hc.P
SCHNORR_PUBLIC_KEY_SIZE = 32
SCHNORR_SIGNATURE_SIZE = 64

TAG_AUX = "BIP0340/aux"
TAG_NONCE = "BIP0340/nonce"
TAG_CHALLENGE = "BIP0340/challenge"


def tagged_hash(tag: str, *vals: bytes) -> bytes:
    """BIP-0340 tagged hash (`schnorr.go:309-320`)."""
    ht = hashlib.sha256(tag.encode()).digest()
    h = hashlib.sha256()
    h.update(ht)
    h.update(ht)
    for v in vals:
        h.update(v)
    return h.digest()


def pre_hash_message(name: str, msg: bytes) -> bytes:
    """PreHashSchnorrMessage; rejects empty domain separators
    (`schnorr.go:56-63`)."""
    if not name:
        raise ValueError("invalid domain separator")
    return tagged_hash(name, msg)


class SchnorrPublicKey:
    """x-only public key; internally the even-y lift (`schnorr.go:257-300`)."""

    __slots__ = ("point", "x_bytes_")

    def __init__(self, point):
        if point is None:
            raise ValueError("public key is the point at infinity")
        if point[1] & 1:
            point = (point[0], P - point[1])
        self.point = point
        self.x_bytes_ = point[0].to_bytes(32, "big")

    @classmethod
    def from_bytes(cls, data: bytes) -> "SchnorrPublicKey":
        if len(data) != SCHNORR_PUBLIC_KEY_SIZE:
            raise ValueError("invalid public key")
        x = int.from_bytes(data, "big")
        p1 = hc.lift_x(x, want_odd=False)
        if p1 is None:
            raise ValueError("invalid public key")
        return cls(p1)

    @classmethod
    def from_ecdsa(cls, pub) -> "SchnorrPublicKey":
        return cls(pub.point)

    def bytes(self) -> bytes:
        return self.x_bytes_

    def __eq__(self, other):
        if not isinstance(other, SchnorrPublicKey):
            return NotImplemented
        # ct compare, mirroring the reference's subtle.ConstantTimeCompare
        # (`/root/reference/secec/bitcoin/schnorr.go:96-104`).
        return _hmac.compare_digest(self.x_bytes_, other.x_bytes_)

    def __hash__(self):
        return hash(self.x_bytes_)


class SchnorrPrivateKey:
    """Schnorr private key: d normalized so that d*G has even y
    (`schnorr.go:140-187`)."""

    __slots__ = ("d", "orig_scalar", "public_key")

    def __init__(self, scalar: int):
        if not 1 <= scalar < N:
            raise ValueError("invalid private key")
        self.orig_scalar = scalar
        point = hc.mul(scalar, hc.G)
        self.public_key = SchnorrPublicKey(point)
        self.d = scalar if not (point[1] & 1) else N - scalar

    @classmethod
    def from_bytes(cls, data: bytes) -> "SchnorrPrivateKey":
        if len(data) != 32:
            raise ValueError("invalid private key")
        return cls(int.from_bytes(data, "big"))

    @classmethod
    def from_ecdsa(cls, priv) -> "SchnorrPrivateKey":
        return cls(priv.scalar)

    def bytes(self) -> bytes:
        return self.orig_scalar.to_bytes(32, "big")

    def __eq__(self, other):
        if not isinstance(other, SchnorrPrivateKey):
            return NotImplemented
        return _hmac.compare_digest(self.bytes(), other.bytes())

    def __hash__(self):
        return hash(self.orig_scalar)


def generate_key(read_fn=None) -> SchnorrPrivateKey:
    if read_fn is None:
        read_fn = os.urandom
    for _ in range(8):
        v = int.from_bytes(read_fn(32), "big")
        if 1 <= v < N:
            return SchnorrPrivateKey(v)
    raise ValueError("failed rejection sampling")


# ---------------------------------------------------------------------------
# Device cores.
# ---------------------------------------------------------------------------

@jax.jit
def _base_mult_affine(k):
    """k*G -> (x bytes, y parity, x mod n is irrelevant here)."""
    big_r = tbl.scalar_base_mult(k)
    aff = pt.to_affine(big_r)
    return fe.to_bytes(aff.x), fe.is_odd(aff.y)


@jax.jit
def _schnorr_sign_stage1(d_bytes):
    """Key-load stage of the arrays sign pipeline: validate d in [1, n),
    P = d*G, and the even-y normalization d_even = -d if y(P) is odd
    (`schnorr.go:140-187`).  Returns (x(P) bytes, d_even bytes, bad_key)."""
    from ..ops import limbs as lb
    d = sc.S._bytes_to_limbs(d_bytes)
    bad = lb.geq_const(d, sc.S.m_limbs) | lb.is_zero(d)
    d_safe = lb.select(~bad, d, sc.one(d.shape[1:]))
    aff = pt.to_affine(tbl.scalar_base_mult(d_safe))
    d_even = sc.select(~fe.is_odd(aff.y), d_safe, sc.neg(d_safe))
    return fe.to_bytes(aff.x), sc.to_bytes(d_even), bad


@jax.jit
def _schnorr_sign_stage2(kp_bytes):
    """Nonce stage: R = k'*G.  k' arrives already reduced mod n (host);
    k' = 0 lanes are flagged and run with 1 (`schnorr.go:349-362`)."""
    from ..ops import limbs as lb
    k = sc.S._bytes_to_limbs(kp_bytes)
    k_zero = lb.is_zero(k)
    k_safe = lb.select(~k_zero, k, sc.one(k.shape[1:]))
    aff = pt.to_affine(tbl.scalar_base_mult(k_safe))
    return fe.to_bytes(aff.x), fe.is_odd(aff.y), k_zero


@jax.jit
def _schnorr_sign_stage3(kp_bytes, r_odd, d_even_bytes, e_bytes, rx_bytes):
    """Closing stage: k = cneg(k', y(R) odd), s = k + e*d, and the mandatory
    fault-attack self-verify R' = (s - d*e)*G recomputed through a second
    base mult, checking even parity and x(R') == x(R)
    (`schnorr.go:364-377,402-417`)."""
    k = sc.S._bytes_to_limbs(kp_bytes)
    d = sc.S._bytes_to_limbs(d_even_bytes)
    e = sc.S._bytes_to_limbs(e_bytes)
    k = sc.select(~r_odd, k, sc.neg(k))
    s = sc.add(k, sc.mul(e, d))
    f = sc.sub(s, sc.mul(d, e))
    r_fe, _ = fe.from_bytes_any(rx_bytes)
    ok = ~_schnorr_tail_bad(tbl.scalar_base_mult(f), r_fe)
    return sc.to_bytes(s), ok


def _schnorr_tail_bad(big_r, r_fe):
    """Shared verify tail: fail if R infinite / odd affine y / x(R) != r
    (`schnorr.go:451-478`).  x(R) == r is checked projectively
    (X == r*Z mod p; r < p from the parse, and identity lanes — where both
    sides are 0 — are rejected by is_inf first), so the rescale is one
    batched inversion + ONE mul for the parity y only, not a full
    to_affine (the Schnorr analog of ECDSA's projective compare,
    `ecdsa._verify_impl`)."""
    is_inf = pt.is_identity(big_r)
    y_odd = fe.is_odd(pt.affine_y(big_r))
    x_ok = fe.eq(big_r.x, fe.mul(r_fe, big_r.z))
    return is_inf | y_odd | ~x_ok


@jax.jit
def _schnorr_verify_core(px, py, s, e_neg, r_fe):
    """R = s*G + (-e)*P; fail if infinite / odd y / x(R) != r
    (`schnorr.go:221-254,451-478`)."""
    p = pt.Point(px, py, fe.one(px.shape[1:]))
    big_r = glv.double_scalar_mult_basepoint(s, e_neg, p)
    bad = _schnorr_tail_bad(big_r, r_fe)
    return jnp.where(bad, ec.ERR_VERIFY_FAILED, ec.OK)


@jax.jit
def _schnorr_verify_e2e_core(pub_x_bytes, r_bytes, s_bytes, e_bytes):
    """Fully device-side BIP-0340 verify from raw byte planes.

    The end-to-end hot path: x-only public-key lift (even-y decompress),
    r < p and s < n canonicality, e reduction mod n, R = s*G - e*P, and the
    parity + x(R) == r checks — zero per-lane host work.  Mirrors
    `Verify` + `parseSchnorrSignature` (`schnorr.go:221-254,420-448`)."""
    batch = pub_x_bytes.shape[1:]
    want_odd = jnp.zeros(batch, dtype=bool)
    pub, pub_status = s11n.decompress(want_odd, pub_x_bytes)
    r_fe, r_red = fe.from_bytes_any(r_bytes)
    s_sc, s_red = sc.S.from_bytes_any(s_bytes)
    e, _ = sc.S.from_bytes_any(e_bytes)
    big_r = glv.double_scalar_mult_basepoint(s_sc, sc.neg(e), pub)
    bad_parse = (pub_status != ec.OK) | r_red | s_red
    bad = _schnorr_tail_bad(big_r, r_fe)
    return jnp.where(bad_parse, ec.ERR_INVALID_ENCODING,
                     jnp.where(bad, ec.ERR_VERIFY_FAILED, ec.OK))




# ---------------------------------------------------------------------------
# Batched API.
# ---------------------------------------------------------------------------

def sign_batch(privs, msgs, rand=None, self_verify: bool = True,
               batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """BIP-0340 sign for a batch; one k'*G launch + one self-verify launch.

    `rand=None` uses os.urandom for aux entropy; pass a .read(n) object for
    deterministic aux (e.g. the BIP-0340 test vectors' fixed aux)."""
    read = os.urandom if rand is None else rand.read
    n = len(privs)
    assert len(msgs) == n

    b = bt.bucket(n)
    k_primes = []
    for i, priv in enumerate(privs):
        aux = read(32)
        if len(aux) != 32:
            raise ValueError("entropy source failure")
        t = bytes(a ^ b_ for a, b_ in
                  zip(tagged_hash(TAG_AUX, aux), priv.d.to_bytes(32, "big")))
        rand_b = tagged_hash(TAG_NONCE, t, priv.public_key.bytes(), msgs[i])
        k_prime = int.from_bytes(rand_b, "big") % N
        if k_prime == 0:
            raise ValueError("k' = 0")
        k_primes.append(k_prime)

    xb, y_odd = _base_mult_affine(bt.plane(k_primes, b, fill=1))
    xbs = bt.unplane_bytes(xb, n)
    y_odd = bt.unplane_flags(y_odd, n)

    sigs = []
    for i, priv in enumerate(privs):
        r_x = xbs[i]
        k = N - k_primes[i] if bool(y_odd[i]) else k_primes[i]
        e = int.from_bytes(
            tagged_hash(TAG_CHALLENGE, r_x, priv.public_key.bytes(), msgs[i]),
            "big") % N
        s = (k + e * priv.d) % N
        sigs.append(r_x + s.to_bytes(32, "big"))

    if self_verify:
        # (s - d*e)*G must reproduce R — mandatory, like the reference
        # (`schnorr.go:379-397`); batched as one ScalarBaseMult.
        factors = []
        for i, (priv, sig) in enumerate(zip(privs, sigs)):
            s_i = int.from_bytes(sig[32:], "big")
            e = int.from_bytes(
                tagged_hash(TAG_CHALLENGE, sig[:32], priv.public_key.bytes(),
                            msgs[i]), "big") % N
            factors.append((s_i - priv.d * e) % N)
        xb2, y_odd2 = _base_mult_affine(bt.plane(factors, b, fill=1))
        xbs2 = bt.unplane_bytes(xb2, n)
        y_odd2 = bt.unplane_flags(y_odd2, n)
        for i, sig in enumerate(sigs):
            if bool(y_odd2[i]) or xbs2[i] != sig[:32]:
                raise RuntimeError("failed to verify new sig")

    return sigs


def _unplane_bytes_np(plane, n: int) -> np.ndarray:
    """[32, *batch] device byte plane -> [n, 32] u8 numpy rows."""
    return np.asarray(plane).astype(np.uint8).reshape(32, -1)[:, :n].T


def _tagged_hash_rows(tag: str, parts: list[np.ndarray | None],
                      n: int) -> np.ndarray:
    """Batched tagged hash over row-arrays; one C++ call when available."""
    from .. import native
    if native.available():
        p = parts + [None] * (3 - len(parts))
        return native.tagged_hash_batch(tag.encode(), p[0], p[1], p[2], n)
    return np.stack([np.frombuffer(
        tagged_hash(tag, *[q[i].tobytes() for q in parts if q is not None]),
        np.uint8) for i in range(n)])


def sign_batch_arrays(priv_bytes: np.ndarray, msgs: np.ndarray,
                      aux: np.ndarray | None = None):
    """End-to-end batched BIP-0340 sign on numpy arrays — the
    zero-per-lane-Python throughput path, dual of `verify_batch_arrays`.

    priv_bytes: [n, 32] u8 big-endian secret scalars; msgs: [n, L] u8
    (uniform length); aux: [n, 32] u8 aux entropy, or None for os.urandom.
    Host work is three batched C++ tagged-hash calls plus a vectorized
    mod-n reduction; key load (d*G, even-y normalize), the nonce point
    R = k'*G, s = k + e*d, and the mandatory (s - d*e)*G self-verify all
    run on device across three jitted stages.  Returns (sigs [n, 64] u8
    x(R)||s, status [n] int32); failed lanes get zeroed signatures.
    Mirrors `signSchnorr` (`/root/reference/secec/bitcoin/schnorr.go:322-399`).
    """
    n = priv_bytes.shape[0]
    assert priv_bytes.shape == (n, 32) and msgs.shape[0] == n
    from .ecdsa import _reduce_digest_np

    b = bt.bucket(n)
    px_b, deven_b, bad_b = _schnorr_sign_stage1(
        bt.byte_plane_np(priv_bytes, b))
    pub_x = _unplane_bytes_np(px_b, n)
    d_even = _unplane_bytes_np(deven_b, n)
    bad_key = np.asarray(bad_b).reshape(-1)[:n]

    if aux is None:
        aux = np.frombuffer(os.urandom(32 * n), np.uint8).reshape(n, 32)
    assert aux.shape == (n, 32)
    # t = d ^ H_tag(aux); rand = H_tag(t || P || m); k' = rand mod n
    # (`schnorr.go:336-362`).
    t = d_even ^ _tagged_hash_rows(TAG_AUX, [aux], n)
    kp = _reduce_digest_np(
        _tagged_hash_rows(TAG_NONCE, [t, pub_x, msgs], n))

    kp_plane = bt.byte_plane_np(kp, b)
    rx_b, r_odd_b, kz_b = _schnorr_sign_stage2(kp_plane)
    rx = _unplane_bytes_np(rx_b, n)
    k_zero = np.asarray(kz_b).reshape(-1)[:n]

    e_arr = _reduce_digest_np(
        _tagged_hash_rows(TAG_CHALLENGE, [rx, pub_x, msgs], n))
    s_b, ok_b = _schnorr_sign_stage3(
        kp_plane, r_odd_b, deven_b, bt.byte_plane_np(e_arr, b), rx_b)
    s_rows = _unplane_bytes_np(s_b, n)
    ok = np.asarray(ok_b).reshape(-1)[:n]

    sigs = np.concatenate([rx, s_rows], axis=1).astype(np.uint8)
    status = np.where(ok, ec.OK, ec.ERR_VERIFY_FAILED).astype(np.int32)
    status[k_zero] = ec.ERR_INVALID_SCALAR     # k' = 0 (`schnorr.go:360`)
    status[bad_key] = ec.ERR_INVALID_SCALAR    # d outside [1, n)
    sigs[status != ec.OK] = 0
    return sigs, status


def _challenge_digests(r_list, pub_bytes_list, msgs):
    """Per-lane BIP-0340 challenge digests; one native C++ call when the
    batch is uniform-width, else per-lane Python hashing."""
    n = len(msgs)
    from .. import native
    if (n > 1 and native.available()
            and len({len(m) for m in msgs}) == 1):
        r_arr = np.frombuffer(b"".join(r_list), np.uint8).reshape(n, 32)
        p_arr = np.frombuffer(b"".join(pub_bytes_list), np.uint8).reshape(n, 32)
        m_arr = np.frombuffer(b"".join(msgs), np.uint8).reshape(n, -1)
        out = native.tagged_hash_batch(TAG_CHALLENGE.encode(),
                                       r_arr, p_arr, m_arr, n)
        return [out[i].tobytes() for i in range(n)]
    return [tagged_hash(TAG_CHALLENGE, r, p, m)
            for r, p, m in zip(r_list, pub_bytes_list, msgs)]


def verify_batch(pubs, msgs, sigs,
                 batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Batched BIP-0340 verify; returns [bool]."""
    n = len(pubs)
    digests = _challenge_digests(
        [sig[:32] if len(sig) == SCHNORR_SIGNATURE_SIZE else b"\x00" * 32
         for sig in sigs],
        [pub.bytes() for pub in pubs], list(msgs))
    lane_ok = []
    s_ints, eneg_ints, r_ints = [], [], []
    for pub, msg, sig, dig in zip(pubs, msgs, sigs, digests):
        ok = True
        r = s = e = 1
        if len(sig) != SCHNORR_SIGNATURE_SIZE:
            ok = False
        else:
            r = int.from_bytes(sig[:32], "big")
            s = int.from_bytes(sig[32:], "big")
            if r >= P or s >= N:
                ok = False
            else:
                e = int.from_bytes(dig, "big") % N
        lane_ok.append(ok)
        r_ints.append(r if ok else 1)
        s_ints.append(s if ok else 1)
        eneg_ints.append((N - e) % N if ok else 1)

    b = bt.bucket(n)
    px = bt.plane([p.point[0] for p in pubs], b, fill=hc.GX)
    py = bt.plane([p.point[1] for p in pubs], b, fill=hc.GY)
    status = bt.unplane_flags(_schnorr_verify_core(
        px, py, bt.plane(s_ints, b, fill=1), bt.plane(eneg_ints, b, fill=1),
        bt.plane(r_ints, b, fill=1)), n)
    return [ok and int(st) == ec.OK for ok, st in zip(lane_ok, status)]


def verify_batch_arrays(pub_x: np.ndarray, msgs: np.ndarray,
                        sigs: np.ndarray, chunk_lanes: int | None = None):
    """End-to-end batched verify on numpy arrays — the zero-per-lane-Python
    throughput path.

    pub_x: [n, 32] u8 x-only keys; msgs: [n, L] u8 (uniform length);
    sigs: [n, 64] u8.  Host work is ONE batched C++ tagged-hash call plus
    vectorized slicing; parsing, key lift and the group math all run on
    device (`_schnorr_verify_e2e_core`).  Returns a [n] bool numpy array.

    chunk_lanes: when set, the batch is cut into chunks dispatched
    back-to-back so chunk i+1's host->device upload overlaps chunk i's
    device compute (same pipelining as `ecdsa.verify_batch_arrays`).
    """
    n = pub_x.shape[0]
    assert sigs.shape == (n, 64) and msgs.shape[0] == n
    r_arr = np.ascontiguousarray(sigs[:, :32])
    s_arr = np.ascontiguousarray(sigs[:, 32:])
    from .. import native
    if native.available():
        e_arr = native.tagged_hash_batch(TAG_CHALLENGE.encode(),
                                         r_arr, pub_x, msgs, n)
    else:
        e_arr = np.stack([np.frombuffer(
            tagged_hash(TAG_CHALLENGE, r_arr[i].tobytes(),
                        pub_x[i].tobytes(), msgs[i].tobytes()),
            np.uint8) for i in range(n)])

    def dispatch(lo, hi):
        b = bt.bucket(hi - lo)
        return _schnorr_verify_e2e_core(
            bt.byte_plane_np(pub_x[lo:hi], b),
            bt.byte_plane_np(r_arr[lo:hi], b),
            bt.byte_plane_np(s_arr[lo:hi], b),
            bt.byte_plane_np(e_arr[lo:hi], b))

    chunk_lanes = bt.auto_chunk(n, chunk_lanes)
    if chunk_lanes is None or n <= chunk_lanes:
        return np.asarray(dispatch(0, n)).reshape(-1)[:n] == ec.OK
    spans = [(lo, min(lo + chunk_lanes, n))
             for lo in range(0, n, chunk_lanes)]
    futures = [dispatch(lo, hi) for lo, hi in spans]
    return np.concatenate(
        [np.asarray(f).reshape(-1)[:hi - lo]
         for f, (lo, hi) in zip(futures, spans)]) == ec.OK


# Single-item conveniences -------------------------------------------------

def sign(priv, msg, rand=None):
    return sign_batch([priv], [msg], rand=rand)[0]


def verify(pub, msg, sig):
    return verify_batch([pub], [msg], [sig])[0]
