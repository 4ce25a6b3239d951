"""Native host runtime: ctypes bindings to the C++ batch-crypto library.

Builds `libhostcrypto.so` from hostcrypto.cpp on first use (g++ -O2) and
caches it next to the source.  All entry points degrade gracefully: if the
toolchain is unavailable, callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "hostcrypto.cpp")
_SO = os.path.join(_DIR, "libhostcrypto.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib():
    """The loaded library or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        L.sha256_batch.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t, u8p]
        L.rfc6979_nonce_batch.argtypes = [u8p, u8p, ctypes.c_size_t,
                                          u8p, u8p, u8p]
        L.rfc6979_continue.argtypes = [u8p, u8p, u8p]
        L.tagged_hash_batch.argtypes = [u8p, u8p, ctypes.c_size_t,
                                        u8p, ctypes.c_size_t,
                                        u8p, ctypes.c_size_t,
                                        ctypes.c_size_t, u8p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.asn1_sig_parse_batch.argtypes = [u8p, i32p, ctypes.c_size_t,
                                           ctypes.c_size_t, u8p, u8p, u8p]
        _LIB = L
        return _LIB


def _p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return lib() is not None


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """[B, L] u8 -> [B, 32] u8 digests."""
    L = lib()
    assert L is not None
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    b, ln = msgs.shape
    out = np.empty((b, 32), dtype=np.uint8)
    L.sha256_batch(_p(msgs), ln, b, _p(out))
    return out


def rfc6979_nonce_batch(keys: np.ndarray, digests: np.ndarray):
    """[B,32] keys + [B,32] digest-scalars -> (k [B,32], state_v, state_k)."""
    L = lib()
    assert L is not None
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    digests = np.ascontiguousarray(digests, dtype=np.uint8)
    b = keys.shape[0]
    out = np.empty((b, 32), dtype=np.uint8)
    sv = np.empty((b, 32), dtype=np.uint8)
    sk = np.empty((b, 32), dtype=np.uint8)
    L.rfc6979_nonce_batch(_p(keys), _p(digests), b, _p(out), _p(sv), _p(sk))
    return out, sv, sk


def rfc6979_continue(state_v: np.ndarray, state_k: np.ndarray, lane: int):
    """Next candidate for one lane; mutates the state rows."""
    L = lib()
    assert L is not None
    out = np.empty((32,), dtype=np.uint8)
    L.rfc6979_continue(_p(state_v[lane]), _p(state_k[lane]), _p(out))
    return out


def asn1_sig_parse_batch(sigs: np.ndarray, lens: np.ndarray):
    """Batched strict-DER ECDSA signature parse.

    sigs: [B, max_len] u8 (rows zero-padded); lens: [B] int32 actual sizes.
    Returns (r [B,32], s [B,32], status [B] u8) with status 0=ok,
    1=malformed encoding, 2=out-of-range scalar — bit-compatible with
    models.codecs.parse_asn1_signature (differentially tested)."""
    import ctypes
    L = lib()
    assert L is not None
    sigs = np.ascontiguousarray(sigs, dtype=np.uint8)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    b, max_len = sigs.shape
    r = np.empty((b, 32), dtype=np.uint8)
    s = np.empty((b, 32), dtype=np.uint8)
    status = np.empty((b,), dtype=np.uint8)
    L.asn1_sig_parse_batch(_p(sigs),
                           lens.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int32)),
                           max_len, b, _p(r), _p(s), _p(status))
    return r, s, status


def tagged_hash_batch(tag: bytes, p1: np.ndarray | None,
                      p2: np.ndarray | None, p3: np.ndarray | None,
                      batch: int) -> np.ndarray:
    """Batched BIP-0340 tagged hash with up to three per-lane parts
    ([B, w] u8 arrays; None = skip)."""
    import hashlib
    L = lib()
    assert L is not None
    th = np.frombuffer(hashlib.sha256(tag).digest(), dtype=np.uint8).copy()

    def prep(p):
        if p is None:
            return np.empty((batch, 0), np.uint8), 0
        p = np.ascontiguousarray(p, dtype=np.uint8)
        return p, p.shape[1]

    a1, l1 = prep(p1)
    a2, l2 = prep(p2)
    a3, l3 = prep(p3)
    out = np.empty((batch, 32), dtype=np.uint8)
    L.tagged_hash_batch(_p(th), _p(a1), l1, _p(a2), l2, _p(a3), l3,
                        batch, _p(out))
    return out
