"""Host codec unit tests: strict DER signatures, SPKI keys, compact forms."""

import pytest

from secp256k1_tpu.models import codecs
from secp256k1_tpu.utils import hostcurve as hc

N = codecs.N


def test_asn1_sig_roundtrip():
    for r, s in [(1, 1), (N - 1, N - 1), (0x80, 0x7F),
                 (1 << 255, (1 << 200) + 7)]:
        sig = codecs.build_asn1_signature(r, s)
        assert codecs.parse_asn1_signature(sig) == (r, s)


@pytest.mark.parametrize("bad", [
    b"",                                  # empty
    b"\x30\x00",                          # empty sequence
    bytes.fromhex("3006020101020101ff"),  # trailing after sequence
    bytes.fromhex("30080201010201011111"),  # inner trailing
    bytes.fromhex("3006020100020101"),    # r = 0
    bytes.fromhex("3006020101020100"),    # s = 0
    bytes.fromhex("300602810102015f"),    # non-minimal long-form length
    bytes.fromhex("3006020200010201 5f".replace(" ", "")),  # non-minimal int
    bytes.fromhex("3006020181020101"),    # negative r
])
def test_asn1_sig_rejects(bad):
    with pytest.raises(codecs.CodecError):
        codecs.parse_asn1_signature(bad)


def test_asn1_sig_rejects_oversize_scalar():
    big = (N + 1).to_bytes(33, "big")
    body = b"\x02" + bytes([len(big)]) + big + b"\x02\x01\x01"
    sig = b"\x30" + bytes([len(body)]) + body
    with pytest.raises(codecs.CodecError):
        codecs.parse_asn1_signature(sig)


def test_compact_roundtrip():
    r, s = 12345, N - 2
    c = codecs.build_compact_signature(r, s)
    assert len(c) == 64
    assert codecs.parse_compact_signature(c) == (r, s)
    rec = codecs.build_compact_recoverable_signature(r, s, 3)
    assert codecs.parse_compact_recoverable_signature(rec) == (r, s, 3)
    with pytest.raises(codecs.CodecError):
        codecs.parse_compact_signature(c[:-1])
    with pytest.raises(codecs.CodecError):
        codecs.parse_compact_signature(b"\xff" * 64)  # r >= n


def test_spki_roundtrip():
    pt = hc.encode_point(hc.G, compressed=False)
    spki = codecs.build_asn1_public_key(pt)
    assert codecs.parse_asn1_public_key_bytes(spki) == pt
    with pytest.raises(codecs.CodecError):
        codecs.parse_asn1_public_key_bytes(spki[:-2])
    # wrong curve OID
    bad = spki.replace(bytes.fromhex("06052b8104000a"),
                       bytes.fromhex("06052b81040022"))
    with pytest.raises(codecs.CodecError):
        codecs.parse_asn1_public_key_bytes(bad)
