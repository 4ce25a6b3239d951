"""Batched ECDSA: sign (RFC 6979 / hardened-entropy), verify, recover.

The flagship pipeline of the framework — the batched, TPU-native rendering of
`/root/reference/secec/ecdsa.go` (SEC 1 4.1.3 sign / 4.1.4 verify / 4.1.6
recover).  Host side does hashing, nonce derivation and codecs; the device
cores below run every scalar/point operation for thousands of signatures per
launch.  Numerical contracts (hash-to-scalar truncation, recovery-ID bits,
low-s normalization with recovery-ID flip) match the reference bit-exactly.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as fe
from ..ops import glv
from ..ops import limbs as lb
from ..ops import point as pt
from ..ops import s11n
from ..ops import scalar as sc
from ..ops import table as tbl
from ..utils import batching as bt
from ..utils import config as cfg
from ..utils import errors as ec
from ..utils import hostcurve as hc
from . import codecs
from . import keys as keysmod
from .rfc6979 import DrbgRFC6979, RFC6979SHA256
from .tuplehash import TupleHashXOF128

N = hc.N
DOMAIN_SEP_ECDSA = "ECDSA-Sign"
MAX_SCALAR_RESAMPLES = 8


# ---------------------------------------------------------------------------
# Device cores (jitted per batch bucket).
# ---------------------------------------------------------------------------

def _verify_impl(qx, qy, e, r, s):
    """SEC1 4.1.4 steps 1-8 for a whole batch: returns status plane.

    Mirrors `verify` (`/root/reference/secec/ecdsa.go:392-466`) except the
    final comparison: instead of rescaling R (a full batched field
    inversion, `point_projective.go:278`), "v = x_R mod n == r" is checked
    projectively: x_R ≡ r (mod n) with x_R < p iff X == r*Z or
    X == (r+n)*Z (mod p), the latter only when r+n < p.  Identity R is
    rejected first, so Z != 0."""
    bad_rs = sc.is_zero(r) | sc.is_zero(s)
    s_inv = sc.invert_auto(s)
    u1 = sc.mul(e, s_inv)
    u2 = sc.mul(r, s_inv)
    q = pt.Point(qx, qy, fe.one(qx.shape[1:]))
    big_r = glv.double_scalar_mult_basepoint(u1, u2, q)
    is_inf = pt.is_identity(big_r)

    # r as a field element (r < n < p, no reduction needed).
    match1 = fe.eq(big_r.x, fe.mul(r, big_r.z))
    # r + n as integers; only a valid x-candidate when still < p.
    n17 = lb.add(r, jnp.broadcast_to(
        jnp.asarray(lb.int_to_limbs(sc.N), dtype=lb.DTYPE).reshape(
            (16,) + (1,) * (r.ndim - 1)), r.shape), 17)
    fits = ~lb.geq_const(n17, lb.int_to_limbs(fe.P, 17))
    match2 = fe.eq(big_r.x, fe.mul(n17[:16], big_r.z)) & fits
    mismatch = ~(match1 | match2)
    return jnp.where(bad_rs, ec.ERR_INVALID_SIGNATURE,
                     jnp.where(is_inf, ec.ERR_R_IS_INFINITY,
                               jnp.where(mismatch, ec.ERR_V_NEQ_R,
                                         ec.OK)))


_verify_core = jax.jit(_verify_impl)


@functools.partial(jax.jit, static_argnums=(5,))
def _verify_e2e_core(want_odd, pub_x_bytes, e_bytes, r_bytes, s_bytes,
                     reject_malleable=False, host_status=None):
    """End-to-end device verify from raw byte planes: SEC1-compressed
    public-key decompression, hash-to-scalar reduction, optional
    malleability rejection, then the SEC1 4.1.4 core — zero per-lane host
    arithmetic.  `host_status` carries codec-stage failures (ASN.1 parse)
    which take precedence, mirroring the order of `PublicKey.Verify`
    (`/root/reference/secec/ecdsa.go:171-242`)."""
    pub, pub_status = s11n.decompress(want_odd, pub_x_bytes)
    e, _ = sc.S.from_bytes_any(e_bytes)
    r = sc.S._bytes_to_limbs(r_bytes)   # parser guarantees [1, n)
    s = sc.S._bytes_to_limbs(s_bytes)
    st = _verify_impl(pub.x, pub.y, e, r, s)
    st = jnp.where(pub_status != ec.OK, ec.ERR_INVALID_PUBLIC_KEY, st)
    if reject_malleable:
        st = jnp.where(sc.is_greater_than_half_n(s), ec.ERR_MALLEABLE, st)
    if host_status is not None:
        st = jnp.where(host_status != ec.OK, host_status, st)
    return st


@functools.partial(jax.jit, static_argnums=(6,))
def _verify_keyed_core(qx_tab, qy_tab, idx, e_bytes, r_bytes, s_bytes,
                       reject_malleable=False, host_status=None):
    """Keyed e2e verify: public keys come from a device-resident table
    (qx_tab/qy_tab [16, K] affine planes, uploaded once) indexed per lane —
    the serving shape where many signatures share few signers (e.g.
    Bitcoin consensus key reuse).  Cuts the per-lane host->device transfer
    by the 33-byte key (~24% of the e2e wire cost through a slow link)."""
    batch = idx.shape
    flat = idx.reshape(-1)
    qx = jnp.take(qx_tab, flat, axis=1).reshape((16,) + batch)
    qy = jnp.take(qy_tab, flat, axis=1).reshape((16,) + batch)
    e, _ = sc.S.from_bytes_any(e_bytes)
    r = sc.S._bytes_to_limbs(r_bytes)
    s = sc.S._bytes_to_limbs(s_bytes)
    st = _verify_impl(qx, qy, e, r, s)
    if reject_malleable:
        st = jnp.where(sc.is_greater_than_half_n(s), ec.ERR_MALLEABLE, st)
    if host_status is not None:
        st = jnp.where(host_status != ec.OK, host_status, st)
    return st


@functools.partial(jax.jit, static_argnums=(7,))
def _verify_e2e_mixed_core(want_odd, is_unc, x_bytes, y_bytes, e_bytes,
                           r_bytes, s_bytes, reject_malleable=False,
                           host_status=None):
    """`_verify_e2e_core` generalized to per-lane SEC1 encodings: lanes
    with is_unc use the uncompressed decode (canonical x, y + curve check,
    `/root/reference/point_s11n.go:174-241`), others decompress from x.
    Both decodes run (uniform schedule — the sqrt dominates and is needed
    for the compressed lanes anyway); the result is a per-lane select."""
    pub_c, st_c = s11n.decompress(want_odd, x_bytes)
    pub_u, st_u = s11n.decode_uncompressed(x_bytes, y_bytes)
    pub = pt.select(is_unc, pub_u, pub_c)
    pub_status = jnp.where(is_unc, st_u, st_c)
    e, _ = sc.S.from_bytes_any(e_bytes)
    r = sc.S._bytes_to_limbs(r_bytes)
    s = sc.S._bytes_to_limbs(s_bytes)
    st = _verify_impl(pub.x, pub.y, e, r, s)
    st = jnp.where(pub_status != ec.OK, ec.ERR_INVALID_PUBLIC_KEY, st)
    if reject_malleable:
        st = jnp.where(sc.is_greater_than_half_n(s), ec.ERR_MALLEABLE, st)
    if host_status is not None:
        st = jnp.where(host_status != ec.OK, host_status, st)
    return st


@jax.jit
def _sign_core(k, e, d):
    """SEC1 4.1.3 steps 1-6 + low-s for a whole batch.

    Returns (r, s, recovery_id, need_retry) planes; mirrors `sign`
    (`/root/reference/secec/ecdsa.go:284-390`): recovery bit 0 = y parity,
    bit 1 = x >= n, XORed with the low-s negation."""
    big_r = tbl.scalar_base_mult(k)
    aff = pt.to_affine(big_r)
    did_reduce = lb.geq_const(aff.x, sc.S.m_limbs)
    r = lb.mod_fold(aff.x, sc.S.c_limbs)
    y_odd = fe.is_odd(aff.y)
    k_inv = sc.invert_auto(k)
    s = sc.mul(sc.add(e, sc.mul(r, d)), k_inv)
    r_zero = sc.is_zero(r)
    s_zero = sc.is_zero(s)
    neg = sc.is_greater_than_half_n(s)
    s = sc.cneg(neg, s)
    recid = ((did_reduce.astype(jnp.int32) << 1) | y_odd.astype(jnp.int32)) \
        ^ neg.astype(jnp.int32)
    return r, s, recid, (r_zero | s_zero)


@jax.jit
def _sign_e2e_core(k_bytes, e_bytes, d_bytes):
    """Byte-plane sign core: candidate/key validity + SEC1 4.1.3 + low-s,
    zero per-lane host arithmetic.  k_bytes are raw DRBG candidates (must
    be in [1, n) or the lane is flagged for resample, mirroring
    `sampleRandomScalar`, `/root/reference/secec/ecdsa.go:524-545`).

    Returns (r_bytes, s_bytes, recid, resample, bad_key) planes."""
    k = sc.S._bytes_to_limbs(k_bytes)
    k_bad = lb.geq_const(k, sc.S.m_limbs) | lb.is_zero(k)
    d = sc.S._bytes_to_limbs(d_bytes)
    bad_key = lb.geq_const(d, sc.S.m_limbs) | lb.is_zero(d)
    e, _ = sc.S.from_bytes_any(e_bytes)
    one = sc.S.one(k.shape[1:])
    k_safe = lb.select(~k_bad, k, one)
    d_safe = lb.select(~bad_key, d, one)
    r, s, recid, retry = _sign_core(k_safe, e, d_safe)
    return (sc.S.to_bytes(r), sc.S.to_bytes(s), recid,
            k_bad | retry, bad_key)


@jax.jit
def _recover_core(r_bytes, recid, e, r, s):
    """SEC1 4.1.6 with explicit recovery ID: Q = (-e r^-1) G + (s r^-1) R.

    Mirrors `RecoverPublicKey` (`/root/reference/secec/ecdsa.go:244-280`).
    Returns (qx bytes, qy bytes, status)."""
    big_r, rec_status = s11n.recover_point(r_bytes, recid)
    r_inv = sc.invert_auto(r)
    u1 = sc.mul(sc.neg(e), r_inv)
    u2 = sc.mul(s, r_inv)
    q = glv.double_scalar_mult_basepoint(u1, u2, big_r)
    is_inf = pt.is_identity(q)
    xb, yb, _, _ = s11n.affine_bytes(q)
    bad_rs = sc.is_zero(r) | sc.is_zero(s)
    status = jnp.where(bad_rs, ec.ERR_INVALID_SIGNATURE,
                       jnp.where(rec_status != ec.OK, rec_status,
                                 jnp.where(is_inf, ec.ERR_INVALID_PUBLIC_KEY,
                                           ec.OK)))
    return xb, yb, status


# ---------------------------------------------------------------------------
# Host helpers.
# ---------------------------------------------------------------------------

def hash_to_scalar_int(digest: bytes) -> int:
    """Leftmost 256 bits of the digest, reduced mod n
    (`/root/reference/secec/ecdsa.go:477-486`)."""
    if len(digest) < 32:
        raise ValueError("invalid digest")
    return int.from_bytes(digest[:32], "big") % N




def _nonce_reader(rand, priv: keysmod.PrivateKey, e: int):
    """mitigateDebianAndSony (`/root/reference/secec/ecdsa.go:488-522`):
    RFC6979 sentinel -> HMAC-DRBG; else TupleHashXOF128(key, entropy, e)."""
    if isinstance(rand, RFC6979SHA256):
        return DrbgRFC6979(priv.bytes(), e.to_bytes(32, "big")).read
    read = os.urandom if rand is None else rand.read
    entropy = read(32)
    if len(entropy) != 32:
        raise ValueError("entropy source failure")
    xof = TupleHashXOF128(
        b"Honorary Debian/Sony RNG mitigation:" + DOMAIN_SEP_ECDSA.encode())
    xof.write(priv.bytes())
    xof.write(entropy)
    xof.write(e.to_bytes(32, "big"))
    return xof.read


def _nonce_readers_batch(rand, privs, e_ints):
    """Per-lane nonce readers; uses the native C++ batched RFC 6979 DRBG
    (secp256k1_tpu/native) when applicable — one C call derives every
    lane's first candidate, retries fall back to per-lane continuation."""
    if isinstance(rand, RFC6979SHA256):
        from .. import native
        if native.available() and privs:
            keys_arr = np.stack([np.frombuffer(p.bytes(), np.uint8)
                                 for p in privs])
            e_arr = np.stack([np.frombuffer(e.to_bytes(32, "big"), np.uint8)
                              for e in e_ints])
            first, sv, sk = native.rfc6979_nonce_batch(keys_arr, e_arr)

            def make_reader(i):
                state = {"first": True}

                def read(n):
                    assert n == 32
                    if state["first"]:
                        state["first"] = False
                        return first[i].tobytes()
                    return native.rfc6979_continue(sv, sk, i).tobytes()
                return read
            return [make_reader(i) for i in range(len(privs))]
    return [_nonce_reader(rand, p, e) for p, e in zip(privs, e_ints)]


def _check_digest(digest: bytes, opts: cfg.ECDSAOptions):
    want = cfg.HASH_SIZES.get(opts.hash)
    if want is not None and len(digest) != want:
        raise ValueError("invalid digest length")


# ---------------------------------------------------------------------------
# Batched public API.
# ---------------------------------------------------------------------------

def sign_batch(privs, digests, rand=None, opts: cfg.ECDSAOptions | None = None,
               batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Sign a batch: one k*G launch for all lanes.  Returns encoded sigs.

    privs: list[PrivateKey]; digests: list[bytes]; rand: None (os.urandom),
    an object with .read(n), or RFC6979SHA256() for deterministic sigs."""
    opts = opts or cfg.ECDSAOptions()
    n = len(privs)
    assert len(digests) == n
    for d in digests:
        _check_digest(d, opts)

    e_ints = [hash_to_scalar_int(d) for d in digests]
    readers = _nonce_readers_batch(rand, privs, e_ints)
    ks = [keysmod.sample_random_scalar(rd) for rd in readers]

    b = bt.bucket(n)
    d_plane = bt.plane([p.scalar for p in privs], b, fill=1)
    e_plane = bt.plane(e_ints, b, fill=0)

    results = [None] * n
    remaining = set(range(n))
    for _ in range(MAX_SCALAR_RESAMPLES):
        k_plane = bt.plane(ks, b, fill=1)
        r, s, recid, retry = _sign_core(k_plane, e_plane, d_plane)
        r_i = bt.unplane_ints(r, n)
        s_i = bt.unplane_ints(s, n)
        v_i = bt.unplane_flags(recid, n)
        retry_i = bt.unplane_flags(retry, n)
        for i in list(remaining):
            if not retry_i[i]:
                results[i] = (r_i[i], s_i[i], int(v_i[i]))
                remaining.discard(i)
            else:
                ks[i] = keysmod.sample_random_scalar(readers[i])
        if not remaining:
            break
    if remaining:
        raise RuntimeError("failed rejection sampling for r/s")

    if opts.self_verify:
        ok = verify_raw_batch([p.public_key for p in privs], digests,
                              [(r, s) for r, s, _ in results],
                              batch_cfg=batch_cfg)
        if not all(ok):
            raise RuntimeError("failed to verify new sig")
        if any(v & ~0x3 for _, _, v in results):
            raise RuntimeError("failed to verify new sig")

    return [_encode_sig(r, s, v, opts.encoding) for r, s, v in results]


def _reduce_digest_np(digests: np.ndarray) -> np.ndarray:
    """[n, 32] u8 big-endian digests -> e = int(digest) mod n, as [n, 32]
    u8 — the batched `hashToScalar` (`/root/reference/secec/ecdsa.go:477`).
    Since 2^256 < 2n one conditional subtract fully reduces; vectorized
    lexicographic compare + byte borrow chain, no per-lane Python ints."""
    nrow = np.frombuffer(N.to_bytes(32, "big"), np.uint8).astype(np.int16)
    d = digests.astype(np.int16)
    diff = d - nrow[None]
    nz = diff != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    ge = np.where(
        has, np.take_along_axis(diff, first[:, None], 1)[:, 0] > 0, True)
    res = d.copy()
    res[ge] -= nrow[None]
    for j in range(31, 0, -1):
        borrow = (res[:, j] < 0).astype(np.int16)
        res[:, j] += 256 * borrow
        res[:, j - 1] -= borrow
    return res.astype(np.uint8)


def sign_batch_arrays(priv_bytes: np.ndarray, digests: np.ndarray):
    """Deterministic (RFC 6979 / SHA-256) end-to-end batched sign on numpy
    arrays — the zero-per-lane-Python throughput path, dual of
    `verify_batch_arrays`.

    priv_bytes: [n, 32] u8 big-endian private scalars; digests: [n, 32] u8.
    Host work: one batched C++ HMAC-DRBG call for every lane's nonce
    candidate + vectorized digest reduction; the scalar/point math runs on
    device (`_sign_e2e_core`).  Returns (sigs [n, 64] u8 compact r||s,
    recids [n] int32, status [n] int32); invalid-key lanes get
    ERR_INVALID_SCALAR and zeroed output.  Mirrors `SignRaw`
    (`/root/reference/secec/ecdsa.go:161,284-390`) with RFC6979SHA256."""
    n = priv_bytes.shape[0]
    assert priv_bytes.shape == (n, 32) and digests.shape == (n, 32)
    e_arr = _reduce_digest_np(digests)
    from .. import native
    if native.available():
        k_first, _sv, _sk = native.rfc6979_nonce_batch(priv_bytes, e_arr)
        k_arr = np.ascontiguousarray(k_first)
    else:
        k_arr = np.zeros((n, 32), np.uint8)
        for i in range(n):
            rd = DrbgRFC6979(priv_bytes[i].tobytes(),
                             e_arr[i].tobytes()).read
            k_arr[i] = np.frombuffer(rd(32), np.uint8)

    b = bt.bucket(n)
    r_b, s_b, recid, resample, bad_key = _sign_e2e_core(
        bt.byte_plane_np(k_arr, b), bt.byte_plane_np(e_arr, b),
        bt.byte_plane_np(priv_bytes, b))
    r_np = np.asarray(r_b).astype(np.uint8).reshape(32, -1)[:, :n]
    s_np = np.asarray(s_b).astype(np.uint8).reshape(32, -1)[:, :n]
    recid_np = np.asarray(recid).reshape(-1)[:n].astype(np.int32)
    resample_np = np.asarray(resample).reshape(-1)[:n]
    bad_np = np.asarray(bad_key).reshape(-1)[:n]

    sigs = np.concatenate([r_np.T, s_np.T], axis=1).astype(np.uint8)
    status = np.where(bad_np, ec.ERR_INVALID_SCALAR, ec.OK).astype(np.int32)
    sigs[status != ec.OK] = 0
    recid_np[status != ec.OK] = 0

    # Candidate >= n / k = 0 / r = 0 / s = 0 lanes (each ~2^-128 per draw):
    # re-run through the per-lane path, whose rejection loop walks the same
    # deterministic DRBG stream past the rejected candidates.
    for i in np.nonzero(resample_np & ~bad_np)[0]:
        priv = keysmod.PrivateKey(
            int.from_bytes(priv_bytes[i].tobytes(), "big"))
        sig = sign_batch(
            [priv], [digests[i].tobytes()], rand=RFC6979SHA256(),
            opts=cfg.ECDSAOptions(
                encoding=cfg.SignatureEncoding.COMPACT_RECOVERABLE))[0]
        sigs[i] = np.frombuffer(sig[:64], np.uint8)
        recid_np[i] = sig[64]
    return sigs, recid_np, status


def _encode_sig(r, s, v, encoding):
    if encoding == cfg.SignatureEncoding.ASN1:
        return codecs.build_asn1_signature(r, s)
    if encoding == cfg.SignatureEncoding.COMPACT:
        return codecs.build_compact_signature(r, s)
    if encoding == cfg.SignatureEncoding.COMPACT_RECOVERABLE:
        return codecs.build_compact_recoverable_signature(r, s, v)
    raise ValueError("invalid encoding")


def verify_raw_batch_status(pubs, digests, rs_pairs,
                            batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Verify (r, s) int pairs against pubs/digests — the device split path
    (`verify`, `/root/reference/secec/ecdsa.go:392`).  Returns per-lane
    status codes (OK / ERR_INVALID_SIGNATURE / ERR_R_IS_INFINITY /
    ERR_V_NEQ_R)."""
    n = len(pubs)
    b = bt.bucket(n)
    qx = bt.plane([p.point[0] for p in pubs], b, fill=hc.GX)
    qy = bt.plane([p.point[1] for p in pubs], b, fill=hc.GY)
    e_plane = bt.plane([hash_to_scalar_int(d) for d in digests], b)
    r_plane = bt.plane([r for r, _ in rs_pairs], b, fill=1)
    s_plane = bt.plane([s for _, s in rs_pairs], b, fill=1)
    status = bt.unplane_flags(_verify_core(qx, qy, e_plane, r_plane, s_plane), n)
    return [int(st) for st in status]


def verify_raw_batch(pubs, digests, rs_pairs,
                     batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Verify (r, s) int pairs against pubs/digests.  Returns [bool]."""
    return [st == ec.OK
            for st in verify_raw_batch_status(pubs, digests, rs_pairs,
                                              batch_cfg=batch_cfg)]


def verify_batch_status(pubs, digests, sigs,
                        opts: cfg.ECDSAOptions | None = None,
                        batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Parse encoded sigs and verify; returns per-lane status codes
    (utils.errors).  Mirrors `PublicKey.Verify`
    (`/root/reference/secec/ecdsa.go:171-242`) with the reference's error
    taxonomy: ERR_INVALID_DIGEST (digest length), ERR_INVALID_ENCODING
    (malformed ASN.1/compact), ERR_INVALID_SCALAR (out-of-range r/s),
    ERR_MALLEABLE (s > n/2 under RejectMalleable), then the device statuses
    (OK / ERR_R_IS_INFINITY / ERR_V_NEQ_R / ERR_INVALID_SIGNATURE)."""
    opts = opts or cfg.ECDSAOptions()
    n = len(pubs)
    parsed = []
    lane_status = []
    digests = list(digests)
    for i, sig in enumerate(sigs):
        status = ec.OK
        r, s, v = 1, 1, 0
        try:
            _check_digest(digests[i], opts)
            if len(digests[i]) < 32:
                raise ValueError("invalid digest")
        except ValueError:
            status = ec.ERR_INVALID_DIGEST
        if status == ec.OK:
            try:
                if opts.encoding == cfg.SignatureEncoding.ASN1:
                    r, s = codecs.parse_asn1_signature(sig)
                elif opts.encoding == cfg.SignatureEncoding.COMPACT:
                    r, s = codecs.parse_compact_signature(sig)
                elif opts.encoding == cfg.SignatureEncoding.COMPACT_RECOVERABLE:
                    r, s, v = codecs.parse_compact_recoverable_signature(sig)
                else:
                    raise codecs.CodecError("invalid encoding")
                if opts.reject_malleable and s > N // 2:
                    status = ec.ERR_MALLEABLE
            except codecs.ScalarError:
                status = ec.ERR_INVALID_SCALAR
            except (codecs.CodecError, ValueError):
                status = ec.ERR_INVALID_ENCODING
        if status != ec.OK:
            r, s, v = 1, 1, 0
            digests[i] = b"\x00" * 32  # keep the device batch well-formed
        parsed.append((r, s, v))
        lane_status.append(status)

    if opts.encoding == cfg.SignatureEncoding.COMPACT_RECOVERABLE:
        # Recover then compare keys, like the reference.
        recs = recover_batch(digests, list(parsed), batch_cfg=batch_cfg)
        out = []
        for st, rec, pub in zip(lane_status, recs, pubs):
            if st != ec.OK:
                out.append(st)
            elif rec is None or rec != pub:
                out.append(ec.ERR_VERIFY_FAILED)
            else:
                out.append(ec.OK)
        return out

    b = bt.bucket(n)
    qx = bt.plane([p.point[0] for p in pubs], b, fill=hc.GX)
    qy = bt.plane([p.point[1] for p in pubs], b, fill=hc.GY)
    e_plane = bt.plane([hash_to_scalar_int(d) for d in digests], b)
    r_plane = bt.plane([r for r, _, _ in parsed], b, fill=1)
    s_plane = bt.plane([s for _, s, _ in parsed], b, fill=1)
    dev = bt.unplane_flags(_verify_core(qx, qy, e_plane, r_plane, s_plane), n)
    return [st if st != ec.OK else int(d)
            for st, d in zip(lane_status, dev)]


def verify_batch(pubs, digests, sigs, opts: cfg.ECDSAOptions | None = None,
                 batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Boolean form of `verify_batch_status`: True where status == OK."""
    return [st == ec.OK
            for st in verify_batch_status(pubs, digests, sigs, opts=opts,
                                          batch_cfg=batch_cfg)]


def _parse_sigs_host(sigs: np.ndarray, lens: np.ndarray, n: int):
    """Batched strict-DER parse only: returns (r_arr[n,32], s_arr[n,32],
    host_status[n] int32) with no key checks and no inert fill."""
    from .. import native
    if native.available():
        r_arr, s_arr, pstat = native.asn1_sig_parse_batch(sigs, lens)
    else:  # pure-python fallback (same status taxonomy)
        r_arr = np.zeros((n, 32), np.uint8)
        s_arr = np.zeros((n, 32), np.uint8)
        pstat = np.zeros((n,), np.uint8)
        for i in range(n):
            try:
                r, s = codecs.parse_asn1_signature(
                    sigs[i, :lens[i]].tobytes())
                r_arr[i] = np.frombuffer(r.to_bytes(32, "big"), np.uint8)
                s_arr[i] = np.frombuffer(s.to_bytes(32, "big"), np.uint8)
            except codecs.ScalarError:
                pstat[i] = 2
            except codecs.CodecError:
                pstat[i] = 1

    host_status = np.where(
        pstat == 0, ec.OK,
        np.where(pstat == 1, ec.ERR_INVALID_ENCODING,
                 ec.ERR_INVALID_SCALAR)).astype(np.int32)
    return r_arr, s_arr, host_status


def _inert_fill(r_arr, s_arr, host_status):
    """Failed lanes get inert device inputs (r = s = 1)."""
    one32 = np.zeros((32,), np.uint8)
    one32[31] = 1
    bad = host_status != ec.OK
    return (np.where(bad[:, None], one32[None], r_arr),
            np.where(bad[:, None], one32[None], s_arr))


def _e2e_host_parse(pubs_sec1: np.ndarray, sigs: np.ndarray,
                    lens: np.ndarray):
    """Host stage of the arrays pipeline: batched strict-DER parse + prefix
    checks.  Returns (r_arr[n,32], s_arr[n,32], host_status[n] int32)."""
    n = pubs_sec1.shape[0]
    r_arr, s_arr, host_status = _parse_sigs_host(sigs, lens, n)
    prefix = pubs_sec1[:, 0]
    bad_prefix = (prefix != 0x02) & (prefix != 0x03)
    if pubs_sec1.shape[1] == 65:  # mixed-encoding batch: 0x04 also legal
        bad_prefix &= prefix != 0x04
    host_status = np.where(
        bad_prefix & (host_status == ec.OK),
        ec.ERR_INVALID_PUBLIC_KEY, host_status).astype(np.int32)
    r_arr, s_arr = _inert_fill(r_arr, s_arr, host_status)
    return r_arr, s_arr, host_status


def _e2e_dispatch(pubs_sec1, digests, r_arr, s_arr, host_status,
                  reject_malleable):
    """Marshal one chunk to planes and dispatch the device core (async —
    returns the un-materialized status array).  33-wide key arrays take the
    compressed-only core; 65-wide take the mixed per-lane-encoding core."""
    n = pubs_sec1.shape[0]
    b = bt.bucket(n)
    prefix = pubs_sec1[:, 0]
    want_odd = bt.scalar_plane((prefix == 0x03).astype(np.int32), b) != 0
    if pubs_sec1.shape[1] == 65:
        is_unc = bt.scalar_plane((prefix == 0x04).astype(np.int32), b) != 0
        return _verify_e2e_mixed_core(
            want_odd, is_unc, bt.byte_plane_np(pubs_sec1[:, 1:33], b),
            bt.byte_plane_np(pubs_sec1[:, 33:65], b),
            bt.byte_plane_np(digests, b), bt.byte_plane_np(r_arr, b),
            bt.byte_plane_np(s_arr, b), reject_malleable,
            bt.scalar_plane(host_status, b))
    return _verify_e2e_core(
        want_odd, bt.byte_plane_np(pubs_sec1[:, 1:], b),
        bt.byte_plane_np(digests, b), bt.byte_plane_np(r_arr, b),
        bt.byte_plane_np(s_arr, b), reject_malleable,
        bt.scalar_plane(host_status, b))


def verify_batch_arrays(pubs_sec1: np.ndarray, digests: np.ndarray,
                        sigs: np.ndarray, lens: np.ndarray | None = None,
                        reject_malleable: bool = False,
                        chunk_lanes: int | None = None,
                        pub_lens: np.ndarray | None = None):
    """End-to-end batched ECDSA verify on numpy arrays — the
    zero-per-lane-Python throughput path (honest host-inclusive pipeline).

    pubs_sec1: [n, 33] u8 SEC1-compressed public keys, or [n, 65] u8 with
    per-lane mixed encodings (0x02/0x03 compressed zero-padded, 0x04
    uncompressed — `/root/reference/point_s11n.go:174-241`); digests:
    [n, D] u8 with D >= 32 — like the reference's hashToScalar, the
    leftmost 256 bits are used (`secec/ecdsa.go:477-486`); sigs:
    [n, max_len] u8 zero-padded ASN.1 DER; lens: [n] int32 actual lengths
    (None = every row is max_len).  Host work: one batched C++ strict-DER
    parse; decompression, reduction and the group math run on device.
    Returns an [n] int status array (utils.errors codes).

    chunk_lanes: when set (power of two, >= 1024 on TPU), the batch is cut
    into chunks dispatched back-to-back so host->device upload of chunk
    i+1 overlaps device compute of chunk i — the host-inclusive analog of
    the reference's streaming verify loop, pipelined instead of serial.

    pub_lens: optional [n] int32 actual key-encoding lengths; lanes whose
    length disagrees with the prefix-implied one (33 compressed / 65
    uncompressed) fail with ERR_INVALID_PUBLIC_KEY, matching the
    reference's length-strict NewPublicKey.
    """
    n = pubs_sec1.shape[0]
    assert pubs_sec1.shape[1] in (33, 65) and digests.shape[0] == n \
        and digests.shape[1] >= 32
    if digests.shape[1] > 32:
        digests = np.ascontiguousarray(digests[:, :32])
    if lens is None:
        lens = np.full((n,), sigs.shape[1], dtype=np.int32)

    r_arr, s_arr, host_status = _e2e_host_parse(pubs_sec1, sigs, lens)
    if pub_lens is not None:
        expect = np.where(pubs_sec1[:, 0] == 0x04, 65, 33)
        host_status = np.where(
            (pub_lens != expect) & (host_status == ec.OK),
            ec.ERR_INVALID_PUBLIC_KEY, host_status).astype(np.int32)

    chunk_lanes = bt.auto_chunk(n, chunk_lanes)
    if chunk_lanes is None or n <= chunk_lanes:
        status = _e2e_dispatch(pubs_sec1, digests, r_arr, s_arr,
                               host_status, reject_malleable)
        return np.asarray(status).reshape(-1)[:n]

    futures = []
    for lo in range(0, n, chunk_lanes):
        hi = min(lo + chunk_lanes, n)
        futures.append(_e2e_dispatch(
            pubs_sec1[lo:hi], digests[lo:hi], r_arr[lo:hi], s_arr[lo:hi],
            host_status[lo:hi], reject_malleable))
    outs = [np.asarray(f).reshape(-1) for f in futures]
    sizes = [min(lo + chunk_lanes, n) - lo for lo in range(0, n, chunk_lanes)]
    return np.concatenate([o[:sz] for o, sz in zip(outs, sizes)])


class PubkeyCache:
    """Device-resident affine public keys for `verify_batch_arrays_keyed`.

    Upload the distinct signer set ONCE (validated host-side through the
    PublicKey invariants), then verify batches reference keys by index —
    the dominant serving shape verifies many signatures per key, so the
    33-byte key drops out of the per-lane transfer."""

    def __init__(self, pubs):
        """pubs: list of keys.PublicKey (or (x, y) int pairs)."""
        pts = [p.point if hasattr(p, "point") else tuple(p) for p in pubs]
        if not pts:
            raise ValueError("empty key set")
        self.n_keys = len(pts)
        self.qx = jnp.asarray(lb.int_to_limbs_batch([x for x, _ in pts]))
        self.qy = jnp.asarray(lb.int_to_limbs_batch([y for _, y in pts]))

    @classmethod
    def from_sec1_arrays(cls, pubs_sec1: np.ndarray):
        """[K, 33|65] u8 SEC1 rows -> cache (host decode + validation)."""
        out = []
        for i in range(pubs_sec1.shape[0]):
            row = pubs_sec1[i]
            blen = 65 if row[0] == 0x04 else 33
            out.append(keysmod.PublicKey.from_bytes(row[:blen].tobytes()))
        return cls(out)


def verify_batch_arrays_keyed(cache: PubkeyCache, key_idx: np.ndarray,
                              digests: np.ndarray, sigs: np.ndarray,
                              lens: np.ndarray | None = None,
                              reject_malleable: bool = False,
                              chunk_lanes: int | None = None):
    """`verify_batch_arrays` with table-referenced public keys: key_idx
    [n] int32 indexes into `cache`.  Out-of-range indices fail with
    ERR_INVALID_PUBLIC_KEY.  Same status contract as the unkeyed path."""
    n = key_idx.shape[0]
    assert digests.shape[0] == n and digests.shape[1] >= 32
    if digests.shape[1] > 32:
        digests = np.ascontiguousarray(digests[:, :32])
    if lens is None:
        lens = np.full((n,), sigs.shape[1], dtype=np.int32)
    r_arr, s_arr, host_status = _parse_sigs_host(sigs, lens, n)
    bad_idx = (key_idx < 0) | (key_idx >= cache.n_keys)
    host_status = np.where(bad_idx & (host_status == ec.OK),
                           ec.ERR_INVALID_PUBLIC_KEY,
                           host_status).astype(np.int32)
    r_arr, s_arr = _inert_fill(r_arr, s_arr, host_status)
    safe_idx = np.where(bad_idx, 0, key_idx).astype(np.int32)

    def dispatch(lo, hi):
        b = bt.bucket(hi - lo)
        return _verify_keyed_core(
            cache.qx, cache.qy, bt.scalar_plane(safe_idx[lo:hi], b),
            bt.byte_plane_np(digests[lo:hi], b),
            bt.byte_plane_np(r_arr[lo:hi], b),
            bt.byte_plane_np(s_arr[lo:hi], b), reject_malleable,
            bt.scalar_plane(host_status[lo:hi], b))

    chunk_lanes = bt.auto_chunk(n, chunk_lanes)
    if chunk_lanes is None or n <= chunk_lanes:
        return np.asarray(dispatch(0, n)).reshape(-1)[:n]
    spans = [(lo, min(lo + chunk_lanes, n))
             for lo in range(0, n, chunk_lanes)]
    futures = [dispatch(lo, hi) for lo, hi in spans]
    return np.concatenate([np.asarray(f).reshape(-1)[:hi - lo]
                           for f, (lo, hi) in zip(futures, spans)])


def recover_batch(digests, rsv_triples,
                  batch_cfg: cfg.BatchConfig = cfg.DEFAULT_BATCH):
    """Recover public keys from (r, s, v) triples.  Returns
    [PublicKey | None] per lane."""
    n = len(rsv_triples)
    b = bt.bucket(n)
    r_ints = [r for r, _, _ in rsv_triples]
    r_bytes = bt.byte_plane([int(r).to_bytes(32, "big") for r in r_ints], b,
                            fill=(1).to_bytes(32, "big"))
    recid = bt.scalar_plane([v for _, _, v in rsv_triples], b)
    e_plane = bt.plane([hash_to_scalar_int(d) for d in digests], b)
    r_plane = bt.plane(r_ints, b, fill=1)
    s_plane = bt.plane([s for _, s, _ in rsv_triples], b, fill=1)
    xb, yb, status = _recover_core(r_bytes, recid, e_plane, r_plane, s_plane)
    xs = bt.unplane_bytes(xb, n)
    ys = bt.unplane_bytes(yb, n)
    status = bt.unplane_flags(status, n)
    out = []
    for i, st in enumerate(status):
        if int(st) != ec.OK:
            out.append(None)
            continue
        x = int.from_bytes(xs[i], "big")
        y = int.from_bytes(ys[i], "big")
        try:
            out.append(keysmod.PublicKey((x, y)))
        except keysmod.KeyError_:
            out.append(None)
    return out


# Single-item conveniences -------------------------------------------------

def sign(priv, digest, rand=None, opts=None):
    return sign_batch([priv], [digest], rand=rand, opts=opts)[0]


def verify(pub, digest, sig, opts=None):
    return verify_batch([pub], [digest], [sig], opts=opts)[0]


def recover_public_key(digest, r, s, v):
    if not (0 <= v <= 3):
        raise ValueError("invalid recovery id")
    if r == 0 or s == 0 or r >= N or s >= N:
        raise ValueError("invalid r or s")
    return recover_batch([digest], [(r, s, v)])[0]
