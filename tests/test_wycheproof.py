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
from secp256k1_tpu.utils import errors as ec

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata", "wycheproof")


def load(name):
    with open(os.path.join(TESTDATA, name)) as f:
        return json.load(f)


def _hash(name, msg):
    return {"SHA-256": hashlib.sha256, "SHA-512": hashlib.sha512}[name](msg).digest()


# Flag -> expected-behavior classes, mirroring the reference harness
# (`/root/reference/secec/wycheproof_test.go:42-93`).
SIG_FLAGS_MUST_REJECT_EARLY = {
    "BerEncodedSignature", "InvalidTypesInSignature", "IntegerOverflow",
    "InvalidEncoding", "MissingZero", "RangeCheck",
}
SIG_FLAGS_MAY_REJECT_EARLY = {
    "ArithmeticError", "InvalidSignature", "ModifiedInteger",
    "ModifiedSignature",
}
SIG_FLAGS_ALWAYS_VALID = {
    "EdgeCasePublicKey", "EdgeCaseShamirMultiplication", "ModularInverse",
    "SmallRandS", "SpecialCaseHash", "ValidSignature",
}
# Flags always caught by the ASN.1 parser itself (not the scalar check)
# (`wycheproof_test.go:349-352`).
SIG_FLAGS_ASN1_ONLY = {
    "BerEncodedSignature", "InvalidTypesInSignature", "InvalidEncoding",
    "MissingZero",
}


def _expected_device_errors(flags):
    """Flags -> acceptable device error classes
    (`wycheproof_test.go:353-362`)."""
    expected = []
    for flag in flags:
        if flag == "ArithmeticError":
            expected.append(ec.ERR_R_IS_INFINITY)
        elif flag in ("InvalidSignature", "ModifiedInteger",
                      "ModifiedSignature", "Untruncatedhash"):
            expected.append(ec.ERR_V_NEQ_R)
        elif flag == "PointDuplication":
            expected.extend([ec.ERR_R_IS_INFINITY, ec.ERR_V_NEQ_R])
    return expected


@pytest.mark.parametrize("fname", ["ecdsa_secp256k1_sha256_test.json",
                                   "ecdsa_secp256k1_sha512_test.json"])
def test_wycheproof_ecdsa_verify(fname):
    data = load(fname)
    lanes = []   # (pub, digest, parsed|None, early_status, flags, result, tcid)
    n_tests = 0
    for group in data["testGroups"]:
        pub = keys.PublicKey.from_bytes(
            bytes.fromhex(group["publicKey"]["uncompressed"]))
        sha = group["sha"]
        for t in group["tests"]:
            n_tests += 1
            digest = _hash(sha, bytes.fromhex(t["msg"]))
            try:
                r, s = codecs.parse_asn1_signature(bytes.fromhex(t["sig"]))
                parsed, early = (r, s), ec.OK
            except codecs.ScalarError:
                parsed, early = None, ec.ERR_INVALID_SCALAR
            except codecs.CodecError:
                parsed, early = None, ec.ERR_INVALID_ENCODING
            lanes.append((pub, digest, parsed, early, set(t["flags"]),
                          t["result"], t["tcId"]))
    assert n_tests == data["numberOfTests"]

    # Batch: split verify path over every parseable signature, then the
    # exhaustive 4-recovery-ID cross-check (`wycheproof_test.go:417-438`).
    dev_lanes = [(i, l) for i, l in enumerate(lanes) if l[2] is not None]
    dev_pubs = [l[0] for _, l in dev_lanes]
    dev_digests = [l[1] for _, l in dev_lanes]
    dev_rs = [l[2] for _, l in dev_lanes]
    statuses = ecdsa.verify_raw_batch_status(dev_pubs, dev_digests, dev_rs)
    recovered_ok = [False] * len(dev_lanes)
    for recid in range(4):
        recs = ecdsa.recover_batch(
            dev_digests, [(r, s, recid) for r, s in dev_rs])
        for j, rec in enumerate(recs):
            if rec is not None and rec == dev_pubs[j]:
                recovered_ok[j] = True

    verdict = {i: st for (i, _), st in zip(dev_lanes, statuses)}
    rec_verdict = {i: ok for (i, _), ok in zip(dev_lanes, recovered_ok)}
    n_checked = 0
    for i, (pub, digest, parsed, early, flags, result, tcid) in \
            enumerate(lanes):
        must_fail = result != "valid"
        has_valid = bool(flags & SIG_FLAGS_ALWAYS_VALID)
        if parsed is None:
            # Early rejection: must be an expected-early case, with the
            # right error class when the flags pin it down.
            assert not has_valid, f"tcId {tcid}: valid sig failed to parse"
            assert flags & (SIG_FLAGS_MUST_REJECT_EARLY
                            | SIG_FLAGS_MAY_REJECT_EARLY), \
                f"tcId {tcid}: unexpected parse failure {flags}"
            if flags & SIG_FLAGS_ASN1_ONLY:
                assert early == ec.ERR_INVALID_ENCODING, \
                    f"tcId {tcid}: expected ASN.1 rejection, got {early}"
            else:
                assert early in (ec.ERR_INVALID_ENCODING,
                                 ec.ERR_INVALID_SCALAR)
            assert must_fail, f"tcId {tcid}: valid case failed to parse"
            n_checked += 1
            continue
        # Parsed: pathologically-bad encodings must not have slipped through.
        assert not (flags & SIG_FLAGS_MUST_REJECT_EARLY), \
            f"tcId {tcid}: bad/exotic encoding {flags} parsed"
        st = verdict[i]
        ok = st == ec.OK
        assert ok == (not must_fail), \
            f"tcId {tcid}: verify={ok} result={result} flags={flags}"
        if not ok:
            assert not has_valid
            expected = _expected_device_errors(flags)
            if expected:
                assert st in expected, \
                    f"tcId {tcid}: error {st} not in {expected} ({flags})"
        # Recovery must agree with the split verify result exactly.
        assert rec_verdict[i] == ok, \
            f"tcId {tcid}: recovery={rec_verdict[i]} verify={ok} ({flags})"
        n_checked += 1
    assert n_checked == n_tests


@pytest.mark.parametrize("fname", ["ecdsa_secp256k1_sha256_test.json",
                                   "ecdsa_secp256k1_sha512_test.json"])
def test_wycheproof_ecdsa_verify_arrays_parity(fname):
    """Every Wycheproof vector through `verify_batch_arrays` (uncompressed
    keys + full-width digests — SHA-512 rows are 64 bytes wide, exercising
    the leftmost-256-bit truncation on the arrays path), asserting exact
    status parity with the per-lane split path + host parser."""
    import numpy as np

    data = load(fname)
    rows = []  # (pub65, digest, sig, expected_status)
    for group in data["testGroups"]:
        pub_raw = bytes.fromhex(group["publicKey"]["uncompressed"])
        pub = keys.PublicKey.from_bytes(pub_raw)
        sha = group["sha"]
        for t in group["tests"]:
            digest = _hash(sha, bytes.fromhex(t["msg"]))
            sig = bytes.fromhex(t["sig"])
            try:
                parsed = codecs.parse_asn1_signature(sig)
                expected = None        # resolved below on device
            except codecs.ScalarError:
                parsed, expected = None, ec.ERR_INVALID_SCALAR
            except codecs.CodecError:
                parsed, expected = None, ec.ERR_INVALID_ENCODING
            rows.append([pub_raw, digest, sig, parsed, expected, pub])

    dev = [r for r in rows if r[3] is not None]
    statuses = ecdsa.verify_raw_batch_status(
        [r[5] for r in dev], [r[1] for r in dev], [r[3] for r in dev])
    for r, st in zip(dev, statuses):
        r[4] = st

    n = len(rows)
    dw = max(len(r[1]) for r in rows)
    sw = max(max(len(r[2]) for r in rows), 1)
    pub_arr = np.zeros((n, 65), np.uint8)
    dig_arr = np.zeros((n, dw), np.uint8)
    sig_arr = np.zeros((n, sw), np.uint8)
    len_arr = np.zeros((n,), np.int32)
    for i, r in enumerate(rows):
        pub_arr[i] = np.frombuffer(r[0], np.uint8)
        dig_arr[i] = np.frombuffer(r[1], np.uint8)
        sig_arr[i, :len(r[2])] = np.frombuffer(r[2], np.uint8)
        len_arr[i] = len(r[2])
    got = ecdsa.verify_batch_arrays(pub_arr, dig_arr, sig_arr, len_arr)
    want = np.asarray([r[4] for r in rows], np.int32)
    mism = np.nonzero(got != want)[0]
    assert mism.size == 0, \
        f"{fname}: {mism.size} status mismatches, first lanes {mism[:5]}: " \
        f"arrays={got[mism[:5]]} per-lane={want[mism[:5]]}"


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
