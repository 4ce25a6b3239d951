"""Scalar-multiplication engines vs the trivial ladder / gold oracle.

Mirrors `/root/reference/point_mul_glv_test.go:16-98` (GLV split identities,
libsecp256k1 edge scalars) and the engine cross-checks of
`point_test.go:262-346`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gold
from helpers import as_batch, from_batch, jitted, rng
from secp256k1_tpu.ops import glv
from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops import point as pt
from secp256k1_tpu.ops import table as tbl

RNG = rng(99)
N = gold.N

# libsecp256k1 GLV edge scalars (public test constants): around n, lambda
# multiples, powers of two.
LAMBDA = (N - glv.NEG_LAMBDA) % N
EDGE_SCALARS = [
    0, 1, 2, N - 1, N - 2, LAMBDA, LAMBDA - 1, LAMBDA + 1,
    (2 * LAMBDA) % N, 2**128, 2**128 - 1, 2**128 + 1, N - 2**128,
    (LAMBDA * 3) % N, RNG.randrange(N), RNG.randrange(N),
]


def rand_points(n):
    return [gold.affine_mul(RNG.randrange(1, N), gold.GEN) for _ in range(n)]


def affine_ints(p):
    aff = jitted(pt.to_affine)(p)
    xs, ys = from_batch(aff.x), from_batch(aff.y)
    ident = list(np.asarray(jitted(pt.is_identity)(p)))
    return [None if i else (x, y) for x, y, i in zip(xs, ys, ident)]


def test_glv_split_identity():
    ks = EDGE_SCALARS
    kb = as_batch(ks)
    k1, k2 = jitted(glv.split)(kb)
    k1i, k2i = from_batch(k1), from_batch(k2)
    for k, a, b in zip(ks, k1i, k2i):
        # recomposition: k = k1 + k2*lambda mod n
        assert (a + b * LAMBDA) % N == k % N
        # balancedness: +-k1, +-k2 are ~128-bit
        assert min(a, N - a) < 2**129
        assert min(b, N - b) < 2**129


def test_signed_digit_recoding():
    # sum of (-1)^sign * mag * 16^i must reproduce the 128-bit value, with
    # magnitudes in [0, 8] (the 8-entry table contract).
    ks = [0, 1, 8, 9, 16, 2**128 - 1, 0x8888_8888, 2**127] + \
        [rng().randrange(2**128) for _ in range(8)]
    digs = np.asarray(jitted(glv._signed_digits_128)(as_batch(ks)))
    assert digs.shape[0] == 33
    for lane, k in enumerate(ks):
        total = 0
        for w in range(33):                  # ms-first
            d = int(digs[w, ..., lane].reshape(-1)[0]) \
                if digs.ndim > 2 else int(digs[w, lane])
            mag, sign = d & 0xF, d >> 4
            assert mag <= 8 and sign <= 1
            total = total * 16 + (-mag if sign else mag)
        assert total == k, hex(k)


def test_mul_beta_is_lambda_mult():
    pts = rand_points(8)
    pb = pt.from_affine_ints(pts)
    via_beta = affine_ints(jitted(glv.mul_beta)(pb))
    want = [gold.affine_mul(LAMBDA, q) for q in pts]
    assert via_beta == want


def test_scalar_mult_vs_gold():
    ks = EDGE_SCALARS
    pts = rand_points(len(ks))
    pb = pt.from_affine_ints(pts)
    kb = as_batch(ks)
    got = affine_ints(jitted(glv.scalar_mult)(kb, pb))
    want = [gold.affine_mul(k % N, q) for k, q in zip(ks, pts)]
    assert got == want


def test_scalar_base_mult_w4():
    ks = EDGE_SCALARS
    kb = as_batch(ks)
    got = affine_ints(jitted(tbl.scalar_base_mult, 1)(kb, 4))
    want = [gold.affine_mul(k % N, gold.GEN) for k in ks]
    assert got == want


def test_scalar_base_mult_w8():
    ks = EDGE_SCALARS
    kb = as_batch(ks)
    got = affine_ints(jitted(tbl.scalar_base_mult, 1)(kb, 8))
    want = [gold.affine_mul(k % N, gold.GEN) for k in ks]
    assert got == want


def test_double_scalar_mult_basepoint():
    n = 12
    u1s = [RNG.randrange(N) for _ in range(n)]
    u2s = [RNG.randrange(N) for _ in range(n)]
    pts = rand_points(n)
    pb = pt.from_affine_ints(pts)
    got = affine_ints(jitted(glv.double_scalar_mult_basepoint, 3)(
        as_batch(u1s), as_batch(u2s), pb, 4))
    want = [gold.affine_add(gold.affine_mul(u1, gold.GEN),
                            gold.affine_mul(u2, q))
            for u1, u2, q in zip(u1s, u2s, pts)]
    assert got == want


def test_base_table_matches_reference_layout():
    """Spot-check generated G tables against gold multiples."""
    t4 = tbl.gen_base_tables_np(4)
    for w, d in ((0, 1), (0, 15), (3, 7), (63, 15)):
        want = gold.affine_mul(d * (1 << (4 * w)), gold.GEN)
        got = (lb.limbs_to_int(t4[w, d - 1, 0]), lb.limbs_to_int(t4[w, d - 1, 1]))
        assert got == want


def test_base_signed_table_layout():
    """Signed table: 33 windows x 128 entries, entry d-1 = d*2^(8w)*G."""
    t = tbl.gen_base_tables_signed_np(8)
    assert t.shape == (33, 128, 2, lb.NLIMBS)
    for w, d in ((0, 1), (0, 128), (5, 77), (32, 1), (32, 2)):
        want = gold.affine_mul(d * (1 << (8 * w)), gold.GEN)
        got = (lb.limbs_to_int(t[w, d - 1, 0]), lb.limbs_to_int(t[w, d - 1, 1]))
        assert got == want


def test_base_signed_digit_recoding():
    # sum of (-1)^sign * mag * 2^(w_bits*w) (ls-window first, incl. the
    # carry window) must reproduce the full scalar, with magnitudes in
    # [0, 2^(w_bits-1)].  w_bits=10/12 exercise the cross-limb digit path.
    ks = [0, 1, 128, 129, 255, 256, N - 1, 2**256 - 2**32 - 978,
          0x8080_8080] + [RNG.randrange(2**256) % N for _ in range(7)]
    for w_bits in (8, 10, 12):
        n_w = -(-256 // w_bits) + 1
        digs = np.asarray(jitted(tbl._signed_digits, 1)(as_batch(ks), w_bits))
        assert digs.shape[0] == n_w
        flat = digs.reshape(n_w, -1)
        for lane, k in enumerate(ks):
            total = 0
            for w in range(n_w - 1, -1, -1):
                d = int(flat[w, lane])
                mag, sign = d & 0xFFFF, d >> 16
                assert mag <= (1 << (w_bits - 1)) and sign <= 1
                assert not (w == n_w - 1 and sign == 1)  # carry non-negative
                total = total * (1 << w_bits) + (-mag if sign else mag)
            assert total == k, (w_bits, hex(k))


def test_scalar_base_mult_signed_unsigned_agree():
    prev = tbl.base_signed_enabled()
    ks = EDGE_SCALARS
    kb = as_batch(ks)
    try:
        tbl.set_base_signed(False)
        unsigned = affine_ints(jitted(tbl.scalar_base_mult, 1)(kb, 8))
    finally:
        tbl.set_base_signed(prev)
    signed = affine_ints(jitted(tbl._scalar_base_mult_signed)(kb))
    assert signed == unsigned


@pytest.mark.parametrize("w_bits", [10, 12])
def test_scalar_base_mult_signed_wide(w_bits):
    """Wider signed windows (cross-limb digits; w12 exercises the committed
    gtable_w12s.npy blob against gold, guarding table corruption)."""
    ks = [0, 1, N - 1, RNG.randrange(N), RNG.randrange(N)]
    kb = as_batch(ks)
    got = affine_ints(jitted(tbl._scalar_base_mult_signed, 1)(kb, w_bits))
    want = [gold.affine_mul(k % N, gold.GEN) for k in ks]
    assert got == want


def test_lookup_shared_affine_all_matches_scanned():
    """The batched all-windows MXU lookup (one einsum) must agree with the
    per-window `lookup_shared_affine` and with direct table indexing
    (digit d -> entry d-1; 0 -> zero rows).  This is the fused base-mult
    selection stage, which the CPU suite otherwise bypasses."""
    tab = tbl.gen_base_tables_signed_np(8)            # [33, 128, 2, 16]
    rng = np.random.default_rng(0)
    mags = jnp.asarray(rng.integers(0, 129, size=(33, 64)).astype(np.uint32))
    ax, ay = jitted(tbl.lookup_shared_affine_all)(jnp.asarray(tab), mags)
    for w in (0, 7, 32):
        bx, by = tbl.lookup_shared_affine(jnp.asarray(tab[w]), mags[w])
        assert np.array_equal(np.asarray(ax[w]), np.asarray(bx))
        assert np.array_equal(np.asarray(ay[w]), np.asarray(by))
    m = np.asarray(mags)
    for w in (0, 32):
        for b in (0, 5):
            d = int(m[w, b])
            want = tab[w, d - 1] if d else np.zeros((2, 16), np.uint32)
            got = np.stack([np.asarray(ax[w, :, b]), np.asarray(ay[w, :, b])])
            assert np.array_equal(got, want), (w, b, d)


def test_lookup_shared_affine_all_window_chunking():
    """A tiny onehot_budget forces the window-chunked einsum path
    (wide-window HBM guard, ADVICE r4); results must be identical to the
    single-dispatch path."""
    tab = jnp.asarray(tbl.gen_base_tables_signed_np(8))
    rng = np.random.default_rng(1)
    mags = jnp.asarray(rng.integers(0, 129, size=(33, 64)).astype(np.uint32))
    ax, ay = jitted(tbl.lookup_shared_affine_all)(tab, mags)
    cx, cy = jitted(lambda t, d: tbl.lookup_shared_affine_all(
        t, d, onehot_budget=2 * 64 * 128 * 5))(tab, mags)  # 5 windows/chunk
    assert np.array_equal(np.asarray(ax), np.asarray(cx))
    assert np.array_equal(np.asarray(ay), np.asarray(cy))
