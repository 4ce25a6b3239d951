"""BIP-0066 DER vectors, consensus verify, and RFC 9380 h2c suite vectors.

Mirrors `/root/reference/secec/bitcoin/asn1_shitcoin_test.go:43-104` and
`/root/reference/secec/h2c/h2c_test.go:35-116`.
"""

import hashlib
import json
import os

import pytest

from secp256k1_tpu.models import bitcoin, ecdsa, h2c, keys
from secp256k1_tpu.models.rfc6979 import RFC6979SHA256

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


def test_bip0066_vectors():
    """Valid DER + sighash byte passes; invalid.decode cases fail
    (`asn1_shitcoin_test.go:43-104` appends sighash byte 69)."""
    with open(os.path.join(TESTDATA, "bip-0066-test-vectors.json")) as f:
        data = json.load(f)
    for case in data["valid"]:
        b = bytes.fromhex(case["DER"]) + b"\x45"
        assert bitcoin.is_valid_signature_encoding_bip0066(b), case["DER"]
    for case in data["invalid"]["decode"]:
        b = bytes.fromhex(case["DER"]) + b"\x45"
        assert not bitcoin.is_valid_signature_encoding_bip0066(b), \
            case["exception"]


def test_expand_message_xmd_batch_matches_scalar():
    import numpy as np
    msgs = [bytes([i]) * 24 for i in range(6)]
    arr = np.stack([np.frombuffer(m, np.uint8) for m in msgs])
    for dst in [b"QUUX-V01-CS02-with-expander-SHA256-128",
                b"x" * 300]:                      # incl. oversize-DST path
        for n_out in (32, 48, 96, 128):
            got = h2c.expand_message_xmd_batch(arr, dst, n_out)
            for i, m in enumerate(msgs):
                assert got[i].tobytes() == h2c.expand_message_xmd(
                    m, dst, n_out), (dst[:8], n_out, i)


def test_h2c_batch_arrays_matches_object_path():
    import numpy as np
    msgs = [bytes([7 * i + 1]) * 32 for i in range(5)]
    arr = np.stack([np.frombuffer(m, np.uint8) for m in msgs])
    dst = b"QUUX-V01-CS02-with-secp256k1_XMD:SHA-256_SSWU_RO_"
    pts, ident = h2c.hash_to_curve_batch_arrays(arr, dst)
    want = h2c.hash_to_curve_batch(msgs, dst)
    assert not ident.any()
    for i, w in enumerate(want):
        assert int.from_bytes(pts[i, :32].tobytes(), "big") == w[0]
        assert int.from_bytes(pts[i, 32:].tobytes(), "big") == w[1]
    pts, ident = h2c.encode_to_curve_batch_arrays(arr, dst)
    want = h2c.encode_to_curve_batch(msgs, dst)
    assert not ident.any()
    for i, w in enumerate(want):
        assert int.from_bytes(pts[i, :32].tobytes(), "big") == w[0]
        assert int.from_bytes(pts[i, 32:].tobytes(), "big") == w[1]


def test_consensus_verify():
    priv = keys.generate_key()
    digest = hashlib.sha256(b"consensus").digest()
    sig = ecdsa.sign(priv, digest, rand=RFC6979SHA256())  # low-s ASN.1
    full = sig + b"\x01"  # sighash byte
    assert bitcoin.verify_asn1(priv.public_key, digest, full)
    # missing sighash byte -> the DER alone fails BIP-0066 length accounting
    assert not bitcoin.verify_asn1(priv.public_key, digest, sig)
    # high-s must be rejected (consensus enforces low-s)
    from secp256k1_tpu.models import codecs
    r, s = codecs.parse_asn1_signature(sig)
    high = codecs.build_asn1_signature(r, keys.N - s) + b"\x01"
    assert not bitcoin.verify_asn1(priv.public_key, digest, high)


@pytest.mark.parametrize("fname,fn", [
    ("secp256k1_XMD_SHA-256_SSWU_RO_.json", h2c.hash_to_curve_batch),
    ("secp256k1_XMD_SHA-256_SSWU_NU_.json", h2c.encode_to_curve_batch),
])
def test_h2c_suite_vectors(fname, fn):
    with open(os.path.join(TESTDATA, fname)) as f:
        data = json.load(f)
    dst = data["dst"].encode()
    msgs = [v["msg"].encode() for v in data["vectors"]]
    got = fn(msgs, dst)
    for v, p in zip(data["vectors"], got):
        assert p is not None
        assert p[0] == int(v["P"]["x"], 16), v["msg"]
        assert p[1] == int(v["P"]["y"], 16), v["msg"]


@pytest.mark.parametrize("fname", ["expand_message_xmd_SHA256_38.json",
                                   "expand_message_xmd_SHA256_256.json"])
def test_expand_message_xmd_vectors(fname):
    with open(os.path.join(TESTDATA, fname)) as f:
        data = json.load(f)
    dst = data["DST"].encode()
    for v in data["tests"]:
        out = h2c.expand_message_xmd(v["msg"].encode(), dst,
                                     int(v["len_in_bytes"], 0))
        assert out.hex() == v["uniform_bytes"], v["msg"][:20]


def test_expand_message_edge_cases():
    with pytest.raises(ValueError):
        h2c.expand_message_xmd(b"m", b"", 32)      # empty DST
    with pytest.raises(ValueError):
        h2c.expand_message_xmd(b"m", b"d", 70000)  # too long
    # oversize DST is reduced, not rejected
    out = h2c.expand_message_xmd(b"m", b"d" * 300, 32)
    assert len(out) == 32
