"""BIP-0340 Schnorr: official vectors (verify + re-sign byte-exact), API.

Mirrors `/root/reference/secec/bitcoin/schnorr_test.go:149-246`.
"""

import csv
import os

import pytest

from secp256k1_tpu.models import schnorr

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


def load_vectors():
    rows = []
    with open(os.path.join(TESTDATA, "bip-0340-test-vectors.csv")) as f:
        rd = csv.DictReader(f)
        for row in rd:
            rows.append(row)
    return rows


class FixedReader:
    def __init__(self, data):
        self.data = data

    def read(self, n):
        assert n == len(self.data)
        return self.data


def test_bip0340_vectors_verify_batch():
    rows = load_vectors()
    pubs, msgs, sigs, wants, idxs = [], [], [], [], []
    for row in rows:
        try:
            pub = schnorr.SchnorrPublicKey.from_bytes(
                bytes.fromhex(row["public key"]))
        except ValueError:
            assert row["verification result"] == "FALSE", row["index"]
            continue
        pubs.append(pub)
        msgs.append(bytes.fromhex(row["message"]))
        sigs.append(bytes.fromhex(row["signature"]))
        wants.append(row["verification result"] == "TRUE")
        idxs.append(row["index"])
    got = schnorr.verify_batch(pubs, msgs, sigs)
    for g, w, i in zip(got, wants, idxs):
        assert g == w, f"vector {i}"


def test_bip0340_vectors_resign():
    """Vectors with a secret key must re-sign byte-identically with the
    fixed aux_rand."""
    rows = [r for r in load_vectors() if r["secret key"]]
    privs = [schnorr.SchnorrPrivateKey.from_bytes(bytes.fromhex(r["secret key"]))
             for r in rows]
    # batch of one per vector since aux differs per lane
    for r, priv in zip(rows, privs):
        aux = bytes.fromhex(r["aux_rand"])
        msg = bytes.fromhex(r["message"])
        sig = schnorr.sign(priv, msg, rand=FixedReader(aux))
        assert sig.hex().upper() == r["signature"], r["index"]
        assert priv.public_key.bytes().hex().upper() == r["public key"], r["index"]


def test_schnorr_roundtrip_and_tamper():
    priv = schnorr.generate_key()
    msg = b"batch me"
    sig = schnorr.sign(priv, msg)
    assert schnorr.verify(priv.public_key, msg, sig)
    assert not schnorr.verify(priv.public_key, b"other", sig)
    bad = bytearray(sig)
    bad[10] ^= 1
    assert not schnorr.verify(priv.public_key, msg, bytes(bad))
    assert not schnorr.verify(priv.public_key, msg, sig[:-1])


def test_schnorr_from_ecdsa_and_prehash():
    from secp256k1_tpu.models import keys as ekeys
    e = ekeys.generate_key()
    sp = schnorr.SchnorrPrivateKey.from_ecdsa(e)
    assert sp.public_key == schnorr.SchnorrPublicKey.from_ecdsa(e.public_key)
    with pytest.raises(ValueError):
        schnorr.pre_hash_message("", b"msg")
    h = schnorr.pre_hash_message("test/domain", b"msg")
    assert len(h) == 32
