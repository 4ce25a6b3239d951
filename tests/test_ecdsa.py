"""ECDSA end-to-end: RFC 6979 KATs, DRBG state KAT, sign/verify/recover.

Mirrors `/root/reference/secec/ecdsa_k_test.go` (KAT CSV at
tests/testdata/secp256k1_rfc6979_sha256.csv, DRBG state-update vectors,
nonce-reuse demonstration sigs) and parts of `secec_test.go`.
"""

import csv
import hashlib
import os

import pytest

from secp256k1_tpu.models import codecs, ecdsa, keys
from secp256k1_tpu.models.rfc6979 import DrbgRFC6979, RFC6979SHA256
from secp256k1_tpu.utils import config as cfg
from secp256k1_tpu.utils import hostcurve as hc

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")
N = hc.N


def sha256(b):
    return hashlib.sha256(b).digest()


def test_rfc6979_kat_batch():
    """All 19 CSV vectors signed as ONE device batch, byte-exact DER out."""
    rows = []
    with open(os.path.join(TESTDATA, "secp256k1_rfc6979_sha256.csv")) as f:
        for row in csv.reader(f):
            if row and not row[0].startswith("#"):
                rows.append(row)
    privs = [keys.PrivateKey(int(r[0])) for r in rows]
    digests = [sha256(r[1].encode()) for r in rows]
    sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    for row, sig in zip(rows, sigs):
        assert sig.hex().upper() == row[2], row[0]


def test_rfc6979_drbg_state_kat():
    """Three successive reads vs a known-good implementation
    (`ecdsa_k_test.go:212-241`)."""
    x = int.from_bytes(sha256(
        b"It's a proprietary strategy. I can't go into it in great detail."),
        "big")
    msg1 = b"This is Fail(TM). But it's not Epic(TM) yet..."
    e = ecdsa.hash_to_scalar_int(sha256(msg1))
    drbg = DrbgRFC6979(x.to_bytes(32, "big"), e.to_bytes(32, "big"))
    expected = [
        "98b1853bf3b2798395bffd1ac98f8abaf3e0e3666268f70541890f5c884111cd",
        "6f52ef0ec8d7e821316fca6780a791df875b03c73405bf4f63321c07c98ace6e",
        "bf6133b75a1a9220e989ad9b765f859a8502257ac5b8d3914329374034f03ce0",
    ]
    for want in expected:
        assert drbg.read(32).hex() == want
    with pytest.raises(ValueError):
        drbg.read(5)


def test_nonce_reuse_fixed_sigs_verify():
    """The fixed (key, k, msg) signature pairs from the key-recovery demo
    (`ecdsa_k_test.go:44-100`) must verify; and the attack recovers d."""
    d = 0x000000000000000000000000E5C4D0A8249A6F27E5E0C9D534F4DA15223F42AD
    key = keys.PrivateKey(d)
    msg1 = sha256(b"This is Fail(TM). But it's not Epic(TM) yet...")
    msg2 = sha256(b"With private keys you can SIGN THINGS")
    r1 = 0x317365E5FADA9DDF645D224952C398B3BFA5DCB4D11803213EE6565639AD25BE
    s1 = 0xC69A9505EFB9A417B5F59F62AD7CD8140947B2E2189FB7EF111A8206D2ED8AA5
    s2 = 0x14577CBF24E320E45C14EFE63B4190E2E00F9936102F00D67CB5E79113EF5A9B
    ok = ecdsa.verify_raw_batch([key.public_key] * 2, [msg1, msg2],
                                [(r1, s1), (r1, s2)])
    assert ok == [True, True]
    # key recovery: k = (z1-z2)/(s1-s2); d = (s1 k - z1)/r
    z1, z2 = (ecdsa.hash_to_scalar_int(m) for m in (msg1, msg2))
    k = (z1 - z2) * pow(s1 - s2, N - 2, N) % N
    bad_k = int.from_bytes(sha256(
        b"chosen by fair dice roll. guaranteed to be random."), "big")
    assert k == bad_k
    assert (s1 * k - z1) * pow(r1, N - 2, N) % N == d


def test_sign_verify_roundtrip_entropy():
    privs = [keys.generate_key() for _ in range(6)]
    digests = [sha256(bytes([i])) for i in range(6)]
    for enc in (cfg.SignatureEncoding.ASN1, cfg.SignatureEncoding.COMPACT,
                cfg.SignatureEncoding.COMPACT_RECOVERABLE):
        opts = cfg.ECDSAOptions(encoding=enc)
        sigs = ecdsa.sign_batch(privs, digests, opts=opts)
        oks = ecdsa.verify_batch([p.public_key for p in privs], digests,
                                 sigs, opts=opts)
        assert oks == [True] * 6
        # wrong digest fails
        oks = ecdsa.verify_batch([p.public_key for p in privs],
                                 [sha256(b"x")] * 6, sigs, opts=opts)
        assert oks == [False] * 6


def test_low_s_and_reject_malleable():
    priv = keys.generate_key()
    digest = sha256(b"malleable?")
    sig = ecdsa.sign(priv, digest, rand=RFC6979SHA256())
    r, s = codecs.parse_asn1_signature(sig)
    assert s <= N // 2  # always low-s on sign
    # flip to high-s: still verifies by default, rejected with the option
    high = codecs.build_asn1_signature(r, N - s)
    assert ecdsa.verify(priv.public_key, digest, high)
    assert not ecdsa.verify(priv.public_key, digest, high,
                            opts=cfg.ECDSAOptions(reject_malleable=True))


def test_recover_public_key():
    privs = [keys.generate_key() for _ in range(4)]
    digests = [sha256(b"recover me %d" % i) for i in range(4)]
    opts = cfg.ECDSAOptions(encoding=cfg.SignatureEncoding.COMPACT_RECOVERABLE)
    sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256(), opts=opts)
    triples = [codecs.parse_compact_recoverable_signature(s) for s in sigs]
    recovered = ecdsa.recover_batch(digests, triples)
    for rec, priv in zip(recovered, privs):
        assert rec is not None and rec == priv.public_key
    # exhaustive: wrong recovery IDs must NOT yield the right key
    for (r, s, v), priv, dgst in zip(triples, privs, digests):
        for wrong_v in range(4):
            if wrong_v == v:
                continue
            rec = ecdsa.recover_public_key(dgst, r, s, wrong_v)
            assert rec is None or rec != priv.public_key


def test_self_verify_option():
    priv = keys.generate_key()
    digest = sha256(b"self-verify")
    sig = ecdsa.sign(priv, digest, opts=cfg.ECDSAOptions(self_verify=True))
    assert ecdsa.verify(priv.public_key, digest, sig)


def test_zero_entropy_still_signs_distinct():
    """All-zero entropy must still give deterministic-but-distinct sigs per
    message/key (`ecdsa_k_test.go:101-190`)."""
    class ZeroReader:
        def read(self, n):
            return b"\x00" * n

    priv = keys.PrivateKey(
        0x00000000000000000000000014B022E892CF8614A44557DB095C928DE9B89970)
    d1, d2 = sha256(b"m1"), sha256(b"m2")
    s1a = ecdsa.sign(priv, d1, rand=ZeroReader())
    s1b = ecdsa.sign(priv, d1, rand=ZeroReader())
    s2 = ecdsa.sign(priv, d2, rand=ZeroReader())
    assert s1a == s1b          # deterministic given fixed entropy
    assert s1a != s2           # but domain-separated by message
    assert ecdsa.verify(priv.public_key, d1, s1a)
    priv2 = keys.generate_key()
    s1c = ecdsa.sign(priv2, d1, rand=ZeroReader())
    assert s1c != s1a          # and by key


def test_invalid_digest_length():
    priv = keys.generate_key()
    with pytest.raises(ValueError):
        ecdsa.sign(priv, b"short")
    assert not ecdsa.verify(priv.public_key, b"short", b"\x30\x00")


def test_corrupted_sig_rejected():
    priv = keys.generate_key()
    digest = sha256(b"corrupt")
    sig = bytearray(ecdsa.sign(priv, digest, rand=RFC6979SHA256()))
    assert ecdsa.verify(priv.public_key, digest, bytes(sig))
    for i in (0, 1, len(sig) // 2, len(sig) - 1):
        bad = bytearray(sig)
        bad[i] ^= 0x40
        assert not ecdsa.verify(priv.public_key, digest, bytes(bad))
    assert not ecdsa.verify(priv.public_key, digest, bytes(sig[:-1]))
