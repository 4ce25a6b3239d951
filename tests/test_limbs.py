"""Differential fuzz of limb primitives and the two mod rings vs Python ints.

Mirrors the reference's algebraic/differential test strategy (SURVEY.md §4.1);
edge values always included: 0, 1, m-1, m-2, 2^256-1 patterns.  All device
calls are jitted at a fixed batch size (tests/helpers.py) so each op compiles
once per session.
"""

import numpy as np
import pytest

from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops.field import F, P
from secp256k1_tpu.ops.scalar import S, N
from helpers import as_batch, from_batch, jitted, pad_vals, rng

RNG = rng()


def edge_vals(m):
    return [0, 1, 2, 3, m - 1, m - 2, (m >> 1), (m >> 1) + 1,
            2**255, 2**128, 2**64, 977, 2**32 + 977]


def rand_vals(m, k):
    return [RNG.randrange(m) for _ in range(k)]


def mixed(m, k=48):
    return edge_vals(m) + rand_vals(m, k)


@pytest.mark.parametrize("ring,m", [(F, P), (S, N)], ids=["p", "n"])
class TestModRing:
    def _pairs(self, m):
        a = mixed(m)
        b = list(reversed(a))
        return a, b

    def _run2(self, fn, m, a, b):
        a_p, n = pad_vals(a)
        b_p, _ = pad_vals(b)
        return from_batch(jitted(fn)(as_batch(a_p), as_batch(b_p)))[:n]

    def _run1(self, fn, m, a):
        a_p, n = pad_vals(a)
        return from_batch(jitted(fn)(as_batch(a_p)))[:n]

    def test_add(self, ring, m):
        a, b = self._pairs(m)
        assert self._run2(ring.add, m, a, b) == [(x + y) % m for x, y in zip(a, b)]

    def test_sub(self, ring, m):
        a, b = self._pairs(m)
        assert self._run2(ring.sub, m, a, b) == [(x - y) % m for x, y in zip(a, b)]

    def test_neg(self, ring, m):
        a, _ = self._pairs(m)
        assert self._run1(ring.neg, m, a) == [(-x) % m for x in a]

    def test_mul(self, ring, m):
        a, b = self._pairs(m)
        assert self._run2(ring.mul, m, a, b) == [(x * y) % m for x, y in zip(a, b)]

    def test_square(self, ring, m):
        a, _ = self._pairs(m)
        assert self._run1(ring.square, m, a) == [x * x % m for x in a]

    def test_mul_word(self, ring, m):
        a, _ = self._pairs(m)
        for w in (21, 977):
            got = self._run1(lambda x, w=w: ring.mul_word(x, w), m, a)
            assert got == [x * w % m for x in a], w

    def test_invert(self, ring, m):
        a = [0, 1, 2, m - 1] + rand_vals(m, 12)
        got = self._run1(ring.invert, m, a)
        assert got == [pow(x, m - 2, m) for x in a]
        assert got[0] == 0  # Invert(0) = 0 contract

    def test_invert_batch(self, ring, m):
        # Montgomery batch inversion: zeros interleaved, full test width
        # (power of two) AND an odd width exercising the tree padding.
        a = [0, 1, 2, m - 1, 0] + rand_vals(m, 12)
        got = self._run1(ring.invert_batch, m, a)
        assert got == [pow(x, m - 2, m) for x in a]
        odd = [0] + rand_vals(m, 6)          # width 7: pads to 8
        got = from_batch(jitted(ring.invert_batch)(as_batch(odd)))
        assert got == [pow(x, m - 2, m) for x in odd]

    def test_invert_auto(self, ring, m):
        # Both selection outcomes produce identical results.
        a = [0, 1, m - 1] + rand_vals(m, 5)
        want = [pow(x, m - 2, m) for x in a]
        assert self._run1(
            lambda x: ring.invert_auto(x, min_batch=4), m, a) == want
        assert self._run1(
            lambda x: ring.invert_auto(x, min_batch=1 << 30), m, a) == want

    def test_predicates(self, ring, m):
        a = [0, 1, 2, m - 1, m >> 1, (m >> 1) + 1, (m >> 1) + 2]
        a_p, n = pad_vals(a)
        x = as_batch(a_p)
        assert list(np.asarray(jitted(ring.is_zero)(x)))[:n] == [v == 0 for v in a]
        assert list(np.asarray(jitted(ring.is_odd)(x)))[:n] == [v & 1 == 1 for v in a]
        assert list(np.asarray(jitted(ring.gt_half)(x)))[:n] == [v > m // 2 for v in a]

    def test_bytes_roundtrip(self, ring, m):
        vals, n = pad_vals(mixed(m, 20))
        byts = np.stack(
            [np.frombuffer(v.to_bytes(32, "big"), dtype=np.uint8)
             for v in vals], axis=-1)
        x, did_reduce = jitted(ring.from_bytes_any)(byts)
        assert from_batch(x)[:n] == [v % m for v in vals[:n]]
        assert not np.any(np.asarray(did_reduce))
        back = np.asarray(jitted(ring.to_bytes)(x))
        assert np.array_equal(back.astype(np.uint8), byts)

    def test_noncanonical_bytes(self, ring, m):
        vals, n = pad_vals([m, m + 1, 2**256 - 1, m + 12345])
        byts = np.stack(
            [np.frombuffer(v.to_bytes(32, "big"), dtype=np.uint8)
             for v in vals], axis=-1)
        x, did_reduce = jitted(ring.from_bytes_any)(byts)
        assert from_batch(x)[:n] == [v % m for v in vals[:n]]
        assert np.all(np.asarray(did_reduce)[:n])
        assert not np.any(np.asarray(jitted(ring.bytes_are_canonical)(byts))[:n])

    def test_wide_bytes(self, ring, m):
        vals, n = pad_vals([0, 1, 2**512 - 1] +
                           [RNG.randrange(2**512) for _ in range(20)])
        byts = np.stack(
            [np.frombuffer(v.to_bytes(64, "big"), dtype=np.uint8)
             for v in vals], axis=-1)
        got = from_batch(jitted(ring.from_wide_bytes)(byts))[:n]
        assert got == [v % m for v in vals[:n]]
        # 48-byte variant (h2c uses 48-byte chunks)
        vals48, n48 = pad_vals([RNG.randrange(2**384) for _ in range(16)])
        byts48 = np.stack(
            [np.frombuffer(v.to_bytes(48, "big"), dtype=np.uint8)
             for v in vals48], axis=-1)
        got = from_batch(jitted(ring.from_wide_bytes)(byts48))[:n48]
        assert got == [v % m for v in vals48[:n48]]


def test_pow_const():
    a = rand_vals(P, 4)
    a_p, n = pad_vals(a)
    for e in (1, 65537):
        got = from_batch(jitted(F.pow_const, 1)(as_batch(a_p), e))[:n]
        assert got == [pow(x, e, P) for x in a], e


def test_mul_wide_raw():
    a, n = pad_vals([RNG.randrange(2**256) for _ in range(32)])
    b, _ = pad_vals([RNG.randrange(2**256) for _ in range(32)])
    got = from_batch(jitted(lb.mul_wide)(as_batch(a), as_batch(b)))[:n]
    assert got == [x * y for x, y in zip(a[:n], b[:n])]


def test_square_wide_raw():
    a, n = pad_vals([0, 1, 2**256 - 1] + [RNG.randrange(2**256) for _ in range(32)])
    got = from_batch(jitted(lb.square_wide)(as_batch(a)))[:n]
    assert got == [x * x for x in a[:n]]


def test_sqrt_field():
    from secp256k1_tpu.ops import field as fe
    sqs = [pow(RNG.randrange(1, P), 2, P) for _ in range(16)]
    non = []
    while len(non) < 8:
        v = RNG.randrange(2, P)
        if pow(v, (P - 1) // 2, P) == P - 1:
            non.append(v)
    vals, n = pad_vals([0, 1, 4, 9] + sqs + non)
    root, ok = jitted(fe.sqrt)(as_batch(vals))
    root_i = from_batch(root)[:n]
    ok_i = list(np.asarray(ok))[:n]
    for v, r, o in zip(vals[:n], root_i, ok_i):
        if pow(v, (P - 1) // 2, P) in (0, 1):
            assert o and r * r % P == v
        else:
            assert not o and r == 0


def test_sqrt_ratio():
    from secp256k1_tpu.ops import field as fe
    us, n = pad_vals([RNG.randrange(1, P) for _ in range(24)])
    vs, _ = pad_vals([RNG.randrange(1, P) for _ in range(24)])
    root, is_qr = jitted(fe.sqrt_ratio)(as_batch(us), as_batch(vs))
    root_i = from_batch(root)[:n]
    qr_i = list(np.asarray(is_qr))[:n]
    Z = P - 11
    for u, v, r, q in zip(us[:n], vs[:n], root_i, qr_i):
        ratio = u * pow(v, P - 2, P) % P
        if q:
            assert r * r % P == ratio
        else:
            assert r * r % P == Z * ratio % P
