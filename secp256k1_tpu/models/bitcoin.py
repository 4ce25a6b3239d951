"""Bitcoin-specific validation: BIP-0066 strict DER + consensus ECDSA verify.

Mirrors `/root/reference/secec/bitcoin/asn1_shitcoin.go:13-115` (byte-for-byte
the same checks) and `ecdsa_shitcoin.go:29-35`.
"""

from __future__ import annotations

from ..utils import config as cfg
from . import ecdsa as ecdsamod

_TAG_SEQUENCE_COMPOUND = 0x30
_TAG_INTEGER = 0x02

_OPTS_CONSENSUS = cfg.ECDSAOptions(
    hash="sha256",
    encoding=cfg.SignatureEncoding.ASN1,
    reject_malleable=True,
)


def is_valid_signature_encoding_bip0066(data: bytes) -> bool:
    """BIP-0066 validator including the trailing sighash byte."""
    len_sig = len(data)
    if len_sig < 9 or len_sig > 73:
        return False
    if data[0] != _TAG_SEQUENCE_COMPOUND:
        return False
    if data[1] != len_sig - 3:
        return False
    len_r = data[3]
    if 5 + len_r >= len_sig:
        return False
    len_s = data[5 + len_r]
    if len_r + len_s + 7 != len_sig:
        return False
    if data[2] != _TAG_INTEGER:
        return False
    if len_r == 0:
        return False
    if data[4] & 0x80:
        return False
    if len_r > 1 and data[4] == 0x00 and not data[5] & 0x80:
        return False
    if data[len_r + 4] != _TAG_INTEGER:
        return False
    if len_s == 0:
        return False
    if data[len_r + 6] & 0x80:
        return False
    if len_s > 1 and data[len_r + 6] == 0x00 and not data[len_r + 7] & 0x80:
        return False
    return True


def verify_asn1(pub, digest: bytes, sig: bytes) -> bool:
    """Consensus-flavored verify: BIP-0066 encoding + low-s enforced."""
    if not is_valid_signature_encoding_bip0066(sig):
        return False
    return ecdsamod.verify(pub, digest, sig[:-1], opts=_OPTS_CONSENSUS)


def verify_asn1_batch(pubs, digests, sigs) -> list:
    enc_ok = [is_valid_signature_encoding_bip0066(s) for s in sigs]
    stripped = [s[:-1] if ok else b"\x30\x00" for s, ok in zip(sigs, enc_ok)]
    dev_ok = ecdsamod.verify_batch(pubs, digests, stripped,
                                   opts=_OPTS_CONSENSUS)
    return [a and b for a, b in zip(enc_ok, dev_ok)]
