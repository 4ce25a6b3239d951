"""Native C++ host-crypto library vs the Python reference implementations."""

import hashlib

import numpy as np
import pytest

from secp256k1_tpu import native
from secp256k1_tpu.models.rfc6979 import DrbgRFC6979
from secp256k1_tpu.models.schnorr import tagged_hash

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_sha256_batch():
    msgs = np.frombuffer(b"".join(bytes([i]) * 40 for i in range(8)),
                         dtype=np.uint8).reshape(8, 40)
    got = native.sha256_batch(msgs)
    for i in range(8):
        assert got[i].tobytes() == hashlib.sha256(msgs[i].tobytes()).digest()


def test_rfc6979_batch_matches_python():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 256, (6, 32), dtype=np.uint8)
    digs = rng.integers(0, 256, (6, 32), dtype=np.uint8)
    out, sv, sk = native.rfc6979_nonce_batch(keys, digs)
    for i in range(6):
        d = DrbgRFC6979(keys[i].tobytes(), digs[i].tobytes())
        assert out[i].tobytes() == d.read(32)
        # two continuation reads exercise the state machine
        assert native.rfc6979_continue(sv, sk, i).tobytes() == d.read(32)
        assert native.rfc6979_continue(sv, sk, i).tobytes() == d.read(32)


def test_tagged_hash_batch():
    rng = np.random.default_rng(6)
    p1 = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    p2 = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    got = native.tagged_hash_batch(b"BIP0340/nonce", p1, p2, None, 5)
    for i in range(5):
        assert got[i].tobytes() == tagged_hash(
            "BIP0340/nonce", p1[i].tobytes(), p2[i].tobytes())


def test_native_sign_path_matches_python_drbg():
    """sign_batch with RFC6979 sentinel must give identical sigs whether the
    native DRBG or the Python DRBG derives the nonces."""
    from secp256k1_tpu.models import ecdsa, keys
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256

    privs = [keys.PrivateKey(i + 1) for i in range(3)]
    digests = [hashlib.sha256(bytes([i])).digest() for i in range(3)]
    native_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    # Force the Python path by monkeypatching availability.
    import secp256k1_tpu.native as nat
    orig = nat.available
    try:
        nat.available = lambda: False
        python_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    finally:
        nat.available = orig
    assert native_sigs == python_sigs


def test_asn1_parse_batch_matches_python():
    """The C++ strict-DER parser must agree with models.codecs on every
    Wycheproof ECDSA signature (valid and pathological) plus edge cases."""
    import json
    import os
    from secp256k1_tpu.models import codecs

    sigs = []
    td = os.path.join(os.path.dirname(__file__), "testdata", "wycheproof")
    for fname in ("ecdsa_secp256k1_sha256_test.json",
                  "ecdsa_secp256k1_sha512_test.json"):
        with open(os.path.join(td, fname)) as f:
            data = json.load(f)
        for group in data["testGroups"]:
            for t in group["tests"]:
                sigs.append(bytes.fromhex(t["sig"]))
    sigs += [b"", b"\x30\x00", b"\x30\x80\x02\x01\x01\x02\x01\x01",
             bytes(80), b"\x30\x06\x02\x01\x01\x02\x01\x01\xff"]

    max_len = max(len(s) for s in sigs)
    arr = np.zeros((len(sigs), max_len), dtype=np.uint8)
    lens = np.zeros((len(sigs),), dtype=np.int32)
    for i, s in enumerate(sigs):
        arr[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)

    r_arr, s_arr, status = native.asn1_sig_parse_batch(arr, lens)
    for i, sig in enumerate(sigs):
        try:
            r, s = codecs.parse_asn1_signature(sig)
            want = (0, r, s)
        except codecs.ScalarError:
            want = (2, None, None)
        except codecs.CodecError:
            want = (1, None, None)
        assert status[i] == want[0], (i, sig.hex(), status[i], want[0])
        if want[0] == 0:
            assert int.from_bytes(r_arr[i].tobytes(), "big") == want[1]
            assert int.from_bytes(s_arr[i].tobytes(), "big") == want[2]
