"""Wycheproof KAT suites: ECDSA verify (SHA-256/SHA-512), ECDH (asn + JWK).

The primary external oracle (SURVEY.md §4.2), run through the *batched*
device pipelines: every vector becomes one lane of a big batch.  Semantics:
'valid' must pass, 'invalid' must fail, 'acceptable' must produce the right
shared secret IF it parses (mirroring `/root/reference/secec/wycheproof_test.go`).
Counts are asserted so silent skips can't pass.
"""

import base64
import hashlib
import json
import os

import pytest

from secp256k1_tpu.models import codecs, ecdh, ecdsa, keys
from secp256k1_tpu.utils import config as cfg

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata", "wycheproof")


def load(name):
    with open(os.path.join(TESTDATA, name)) as f:
        return json.load(f)


def _hash(name, msg):
    return {"SHA-256": hashlib.sha256, "SHA-512": hashlib.sha512}[name](msg).digest()


@pytest.mark.parametrize("fname", ["ecdsa_secp256k1_sha256_test.json",
                                   "ecdsa_secp256k1_sha512_test.json"])
def test_wycheproof_ecdsa_verify(fname):
    data = load(fname)
    lanes = []     # (pub, digest, (r, s) or None parse-fail, result, tcid)
    n_tests = 0
    for group in data["testGroups"]:
        pub = keys.PublicKey.from_bytes(
            bytes.fromhex(group["publicKey"]["uncompressed"]))
        sha = group["sha"]
        opts = cfg.ECDSAOptions(
            hash={"SHA-256": "sha256", "SHA-512": "sha512"}[sha])
        for t in group["tests"]:
            n_tests += 1
            digest = _hash(sha, bytes.fromhex(t["msg"]))
            try:
                r, s = codecs.parse_asn1_signature(bytes.fromhex(t["sig"]))
                parsed = (r, s)
            except codecs.CodecError:
                parsed = None
            lanes.append((pub, digest, parsed, t["result"], t["tcId"], opts))
    assert n_tests == data["numberOfTests"]

    # Batch-verify every parseable signature on device.
    dev_lanes = [(i, l) for i, l in enumerate(lanes) if l[2] is not None]
    oks = ecdsa.verify_raw_batch(
        [l[0] for _, l in dev_lanes],
        [l[1] for _, l in dev_lanes],
        [l[2] for _, l in dev_lanes])
    verdict = {}
    for (i, _), ok in zip(dev_lanes, oks):
        verdict[i] = ok
    n_checked = 0
    for i, (pub, digest, parsed, result, tcid, opts) in enumerate(lanes):
        ok = verdict.get(i, False)
        if result == "valid":
            assert ok, f"tcId {tcid} should verify"
        elif result == "invalid":
            assert not ok, f"tcId {tcid} should NOT verify"
        n_checked += 1
    assert n_checked == n_tests


def _jwk_int(s):
    return int.from_bytes(base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)),
                          "big")


def _parse_ecdh_public(group_encoding, t):
    """Returns PublicKey or raises."""
    if group_encoding == "asn":
        point = codecs.parse_asn1_public_key_bytes(bytes.fromhex(t["public"]))
        return keys.PublicKey.from_bytes(point)
    # webcrypto JWK
    jwk = t["public"]
    if jwk.get("kty") != "EC" or jwk.get("crv") != "P-256K":
        raise ValueError("wrong curve")
    x = _jwk_int(jwk["x"])
    y = _jwk_int(jwk["y"])
    if x >= keys.hc.P or y >= keys.hc.P:
        raise ValueError("coordinate out of range")
    return keys.PublicKey((x, y))


def _parse_ecdh_private(group_encoding, t):
    if group_encoding == "asn":
        v = int(t["private"], 16)
    else:
        v = _jwk_int(t["private"]["d"])
    return keys.PrivateKey(v)


@pytest.mark.parametrize("fname,encoding", [
    ("ecdh_secp256k1_test.json", "asn"),
    ("ecdh_secp256k1_webcrypto_test.json", "webcrypto"),
])
def test_wycheproof_ecdh(fname, encoding):
    data = load(fname)
    n_tests = 0
    dev_privs, dev_pubs, dev_expected, dev_ids = [], [], [], []
    for group in data["testGroups"]:
        for t in group["tests"]:
            n_tests += 1
            result = t["result"]
            try:
                pub = _parse_ecdh_public(encoding, t)
                priv = _parse_ecdh_private(encoding, t)
            except (ValueError, codecs.CodecError, keys.KeyError_):
                assert result in ("invalid", "acceptable"), \
                    f"tcId {t['tcId']}: parse failed on {result}"
                continue
            # Parsed fine: valid/acceptable must produce the right secret;
            # parseable 'invalid' cases must NOT match (they exist e.g. for
            # wrong-order public values that our strict parse may accept).
            dev_privs.append(priv)
            dev_pubs.append(pub)
            dev_expected.append(t["shared"])
            dev_ids.append((t["tcId"], result))
    assert n_tests == data["numberOfTests"]

    shared = ecdh.ecdh_batch(dev_privs, dev_pubs)
    for got, want, (tcid, result) in zip(shared, dev_expected, dev_ids):
        if result in ("valid", "acceptable"):
            assert got.hex() == want, f"tcId {tcid} shared mismatch"
        else:
            assert got.hex() != want, f"tcId {tcid} invalid case matched"
