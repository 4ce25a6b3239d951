"""Interpret-mode differential tests of the production Pallas kernel ENTRY
POINTS on CPU (VERDICT r4 missing #1).

Strategy: the real 256-bit field bodies take >10 min each to compile on
XLA:CPU (measured — even the f32 point-add body), so full-kernel interpret
runs are gated behind a mock single-limb field (`pk.set_mock_field`): limb 0
carries a value mod a small prime, the `fmul`-family indirection dispatches
to 1-op arithmetic, and every kernel compiles in seconds.  This exercises
everything the real-field body tests cannot: pallas grids and BlockSpecs,
ref reads/writes, VMEM scratch tables, `pl.when` init/flush, fori_loops,
digit decoding, sign negation, masked select scans, window-0 unrolls and
bucket accumulation — differentially against a plain-Python re-implementation
of each kernel's orchestration (the point-formula bodies are shared, run
eagerly; their exactness is covered by tests/test_kernel_bodies.py for the
field ops, tests/test_point.py for the formulas on the jnp path, and
tools/tpu_selftest.py for the fused composition on hardware — the analog of
the reference's every-engine differential suite,
`/root/reference/point_test.go:262-346`).

The real-field `_launch` kernels (mod_mul / mod_square / mod_pow2k) ARE run
in interpret mode here — their graphs are one modmul/sqr and compile in
seconds — checked against python ints.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops.pallas import kernels as pk
from helpers import rng

RNG = rng(4242)
TP = 65521                  # toy prime < 2^16: fits one 16-bit limb
S = 8                       # one BLK_S grid step (1024 lanes)


@contextlib.contextmanager
def mock_kernels():
    pk.set_mock_field(TP)
    pk.set_interpret(True)
    try:
        yield
    finally:
        pk.set_mock_field(None)
        pk.set_interpret(False)


@contextlib.contextmanager
def interpret_only():
    pk.set_interpret(True)
    try:
        yield
    finally:
        pk.set_interpret(False)


@pytest.fixture(autouse=True)
def _clear_after():
    yield
    jax.clear_caches()


# --- mock-plane helpers ----------------------------------------------------

def mplane(arr):
    """[.., s, 128] u32 value array -> [.., 16, s, 128] limb plane with the
    value in limb 0 (matching the mock field's convention)."""
    arr = np.asarray(arr, np.uint32)
    out = np.zeros(arr.shape[:-2] + (16,) + arr.shape[-2:], np.uint32)
    out[..., 0, :, :] = arr
    return jnp.asarray(out)


def munplane(x):
    """Limb-plane result -> limb-0 values, asserting limbs 1..15 are 0."""
    a = np.asarray(x)
    assert a[1:].max(initial=0) == 0, "mock field leaked into limbs 1..15"
    return a[0]


def rand_vals(*shape):
    return RNG_NP.integers(0, TP, size=shape).astype(np.uint32)


RNG_NP = np.random.default_rng(20250820)


# --- oracle: the kernels' point bodies, run eagerly under the mock field ---
# (orchestration below is an independent plain-Python re-implementation)

def _rowsof(c):
    c = jnp.asarray(np.asarray(c, np.uint32))
    return [c] + [jnp.zeros_like(c)] * (pk.NLIMBS - 1)


def _limb0(rows):
    return np.asarray(rows[0])


def o_add(p1, p2):
    r = pk._point_add_body(*[_rowsof(c) for c in p1 + p2])
    return tuple(_limb0(c) for c in r)


def o_double(p):
    r = pk._point_double_body(*[_rowsof(c) for c in p])
    return tuple(_limb0(c) for c in r)


def o_add_mixed(p1, qx, qy):
    r = pk._point_add_mixed_body(*[_rowsof(c) for c in p1],
                                 _rowsof(qx), _rowsof(qy))
    return tuple(_limb0(c) for c in r)


def o_neg(y):
    return (TP - y % TP) % TP


def o_identity(shape):
    return (np.zeros(shape, np.uint32),
            np.ones(shape, np.uint32),
            np.zeros(shape, np.uint32))


def o_select(mask, a, b):
    return tuple(np.where(mask, x, y) for x, y in zip(a, b))


def o_table(p, n_entries):
    """Mirror of the in-VMEM table build: [P, 2P, P+2P, ...]."""
    t = [p, o_double(p)]
    for _ in range(2, n_entries):
        t.append(o_add(t[-1], p))
    return t


def o_lookup(table, mag):
    """Masked scan: entry e holds (e+1)*P; mag 0 -> (0, 0, 0)."""
    zero = tuple(np.zeros(mag.shape, np.uint32) for _ in range(3))
    sel = o_select(mag == 1, table[0], zero)
    for e in range(1, len(table)):
        sel = o_select(mag == e + 1, table[e], sel)
    return sel


# --- GLV mega kernels ------------------------------------------------------

def _oracle_glv_from_points(d1, d2, p1, p2, n_entries, signed):
    t1, t2 = o_table(p1, n_entries), o_table(p2, n_entries)
    shape = d1.shape[1:]

    def select(t, d):
        mag = (d & 0xF) if signed else d
        sel = o_lookup(t, mag)
        if signed:
            is_neg = (d >> 4) == 1
            sel = (sel[0], np.where(is_neg, o_neg(sel[1]), sel[1]), sel[2])
        return sel, mag

    def lookup_add(acc, t, d):
        sel, mag = select(t, d)
        added = o_add(acc, sel)
        return o_select(mag == 0, acc, added)

    # Window 0 unrolled: pure select, with the full-identity fixup at mag 0.
    sel0, mag0 = select(t1, d1[0])
    acc = (sel0[0],
           np.where(mag0 == 0, np.ones(shape, np.uint32), sel0[1]),
           sel0[2])
    acc = lookup_add(acc, t2, d2[0])
    for w in range(1, d1.shape[0]):
        for _ in range(4):
            acc = o_double(acc)
        acc = lookup_add(acc, t1, d1[w])
        acc = lookup_add(acc, t2, d2[w])
    return acc


@pytest.mark.parametrize("signed", [False, True], ids=["unsigned", "signed"])
def test_glv_mega_from_points_kernel(signed):
    w, ne = 5, 8 if signed else 15
    if signed:
        mags = RNG_NP.integers(0, 9, size=(w, S, 128)).astype(np.uint32)
        signs = RNG_NP.integers(0, 2, size=(w, S, 128)).astype(np.uint32)
        d1 = mags | (signs << 4)          # sign bits also land on mag-0
        d2 = np.roll(d1, 1, axis=0)
    else:
        d1 = RNG_NP.integers(0, 16, size=(w, S, 128)).astype(np.uint32)
        d2 = np.roll(d1, 1, axis=0)
    d1[0, 0, :4] = 0                      # window-0 identity lanes
    p1 = tuple(rand_vals(S, 128) for _ in range(3))
    p2 = tuple(rand_vals(S, 128) for _ in range(3))

    with mock_kernels():
        fn = (pk.glv_windowed_mult_signed_from_points if signed
              else pk.glv_windowed_mult_from_points)
        x, y, z = fn(jnp.asarray(d1), jnp.asarray(d2),
                     tuple(mplane(c) for c in p1),
                     tuple(mplane(c) for c in p2))
        want = _oracle_glv_from_points(d1, d2, p1, p2, ne, signed)
    got = tuple(munplane(c) for c in (x, y, z))
    for g, w_ in zip(got, want):
        assert np.array_equal(g, w_)


def test_glv_mega_from_tables_kernel():
    """`glv_windowed_mult` (prebuilt [15, 3, 16, S, 128] lane tables)."""
    w = 4
    d1 = RNG_NP.integers(0, 16, size=(w, S, 128)).astype(np.uint32)
    d2 = np.roll(d1, 2, axis=0)
    t1v = rand_vals(15, 3, S, 128)
    t2v = rand_vals(15, 3, S, 128)

    def oracle():
        t1 = [tuple(t1v[e]) for e in range(15)]
        t2 = [tuple(t2v[e]) for e in range(15)]

        def lookup_add(acc, t, d):
            sel = o_lookup(t, d)
            added = o_add(acc, sel)
            return o_select(d == 0, acc, added)

        acc = o_identity((S, 128))
        for i in range(w):
            for _ in range(4):
                acc = o_double(acc)
            acc = lookup_add(acc, t1, d1[i])
            acc = lookup_add(acc, t2, d2[i])
        return acc

    with mock_kernels():
        x, y, z = pk.glv_windowed_mult(
            jnp.asarray(d1), jnp.asarray(d2), mplane(t1v), mplane(t2v))
        want = oracle()
    got = tuple(munplane(c) for c in (x, y, z))
    for g, w_ in zip(got, want):
        assert np.array_equal(g, w_)


# --- fixed-base accumulation kernels ---------------------------------------

def _oracle_base_windowed(digits, selx, sely, signed, q=None):
    shape = digits.shape[1:]

    def select_w(wi):
        d = digits[wi]
        qx, qy = selx[wi], sely[wi]
        if signed:
            is_neg = (d >> 16) == 1
            qy = np.where(is_neg, o_neg(qy), qy)
            d = d & 0xFFFF
        return d, qx, qy

    d0, qx0, qy0 = select_w(0)
    is0 = d0 == 0
    acc = (np.where(is0, 0, qx0),
           np.where(is0, 1, qy0),
           np.where(is0, 0, 1).astype(np.uint32))
    for wi in range(1, digits.shape[0]):
        d, qx, qy = select_w(wi)
        added = o_add_mixed(acc, qx, qy)
        acc = o_select(d == 0, acc, added)
    if q is not None:
        acc = o_add(acc, q)
    return acc


@pytest.mark.parametrize("signed", [False, True], ids=["unsigned", "signed"])
@pytest.mark.parametrize("final", [False, True], ids=["plain", "final_add"])
def test_base_windowed_add_kernel(signed, final):
    w = 6
    mags = RNG_NP.integers(0, 16, size=(w, S, 128)).astype(np.uint32)
    mags[0, 0, :4] = 0                    # window-0 identity lanes
    if signed:
        signs = RNG_NP.integers(0, 2, size=(w, S, 128)).astype(np.uint32)
        digits = mags | (signs << 16)     # sign bits also land on mag-0
    else:
        digits = mags
    selx = rand_vals(w, S, 128)
    sely = rand_vals(w, S, 128)
    q = tuple(rand_vals(S, 128) for _ in range(3)) if final else None

    with mock_kernels():
        if final:
            x, y, z = pk.base_windowed_add_final(
                jnp.asarray(digits), mplane(selx), mplane(sely),
                *(mplane(c) for c in q), signed_digits=signed)
        else:
            x, y, z = pk.base_windowed_add(
                jnp.asarray(digits), mplane(selx), mplane(sely),
                signed_digits=signed)
        want = _oracle_base_windowed(digits, selx, sely, signed, q)
    got = tuple(munplane(c) for c in (x, y, z))
    for g, w_ in zip(got, want):
        assert np.array_equal(g, w_)


# --- Pippenger bucket-accumulation kernel ----------------------------------

def _oracle_msm_buckets(digits, pxyz, n_buckets, blk, signed):
    w, s, _ = digits.shape
    steps = s // blk
    out = np.zeros((w, n_buckets, 3, blk, 128), np.uint32)
    for wi in range(w):
        acc = [o_identity((blk, 128)) for _ in range(n_buckets)]
        for i in range(steps):
            d = digits[wi, i * blk:(i + 1) * blk]
            p = tuple(c[i * blk:(i + 1) * blk] for c in pxyz)
            if signed:
                is_neg = (d >> 6) == 1
                d = d & 0x3F
                p = (p[0], np.where(is_neg, o_neg(p[1]), p[1]), p[2])
            sel = acc[0]
            for b in range(1, n_buckets):
                sel = o_select(d == b + 1, acc[b], sel)
            added = o_add(sel, p)       # fcanon is mod TP: already canonical
            for b in range(n_buckets):
                acc[b] = o_select(d == b + 1, added, acc[b])
        for b in range(n_buckets):
            for c in range(3):
                out[wi, b, c] = acc[b][c]
    return out


@pytest.mark.parametrize("signed", [False, True], ids=["unsigned", "signed"])
def test_msm_bucket_accumulate_all_kernel(signed):
    w, s, blk = 3, 16, 8                  # grid (3, 2): multi-step + flush
    nb = 8 if signed else 15
    if signed:
        mags = RNG_NP.integers(0, 9, size=(w, s, 128)).astype(np.uint32)
        signs = RNG_NP.integers(0, 2, size=(w, s, 128)).astype(np.uint32)
        digits = mags | (signs << 6)
    else:
        digits = RNG_NP.integers(0, 16, size=(w, s, 128)).astype(np.uint32)
    pxyz = tuple(rand_vals(s, 128) for _ in range(3))

    with mock_kernels():
        got = pk.msm_bucket_accumulate_all(
            jnp.asarray(digits), *(mplane(c) for c in pxyz),
            n_buckets=nb, blk_s=blk, signed_digits=signed)
        want = _oracle_msm_buckets(digits, pxyz, nb, blk, signed)
    g = np.asarray(got)                   # [w, nb, 3, 16, blk, 128]
    assert g.shape == (w, nb, 3, 16, blk, 128)
    assert g[:, :, :, 1:].max(initial=0) == 0
    assert np.array_equal(g[:, :, :, 0], want)


# --- point-op entry points (auto-dispatch surface) -------------------------

def test_point_entry_points_mock():
    p1 = tuple(rand_vals(S, 128) for _ in range(3))
    p2 = tuple(rand_vals(S, 128) for _ in range(3))
    tab = rand_vals(15, 3, S, 128)
    dig = RNG_NP.integers(0, 16, size=(S, 128)).astype(np.uint32)

    with mock_kernels():
        m1 = tuple(mplane(c) for c in p1)
        m2 = tuple(mplane(c) for c in p2)
        add = pk.point_add(*m1, *m2)
        dbl = pk.point_double(*m1)
        db4 = pk.point_double4(*m1)
        mix = pk.point_add_mixed(*m1, m2[0], m2[1])
        lka = pk.point_lookup_add(*m1, mplane(tab), jnp.asarray(dig))

        w_add = o_add(p1, p2)
        w_dbl = o_double(p1)
        w_db4 = p1
        for _ in range(4):
            w_db4 = o_double(w_db4)
        w_mix = o_add_mixed(p1, p2[0], p2[1])
        entries = [tuple(tab[e]) for e in range(15)]
        sel = o_lookup(entries, dig)
        w_lka = o_select(dig == 0, p1, o_add(p1, sel))

    for got, want in [(add, w_add), (dbl, w_dbl), (db4, w_db4),
                      (mix, w_mix), (lka, w_lka)]:
        for g, w_ in zip(got, want):
            assert np.array_equal(munplane(g), w_)


# --- real-field _launch kernels in interpret mode --------------------------

def _real_plane(vals):
    return jnp.asarray(lb.int_to_limbs_batch(vals).reshape(16, S, 128))


def _real_ints(x):
    return lb.limbs_to_int_batch(np.asarray(x).reshape(16, -1))


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
@pytest.mark.parametrize("f32", [True, False], ids=["f32", "u32"])
def test_mod_mul_square_interpret(m, f32):
    """The standalone modular kernels through the REAL pallas entry points
    (grid + BlockSpecs + VMEM), bit-exact vs python ints."""
    B = S * 128
    a = [RNG.randrange(m) for _ in range(B)]
    b = [RNG.randrange(m) for _ in range(B)]
    a[:3] = [0, 1, m - 1]
    old = pk._F32
    pk.set_f32(f32)
    try:
        with interpret_only():
            got_mul = _real_ints(pk.mod_mul(_real_plane(a), _real_plane(b), m))
            got_sqr = _real_ints(pk.mod_square(_real_plane(a), m))
    finally:
        pk.set_f32(old)
    assert got_mul == [x * y % m for x, y in zip(a, b)]
    assert got_sqr == [x * x % m for x in a]


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
def test_mod_pow2k_interpret(m):
    """The fused k-squarings kernel (fori_loop in VMEM + lazy canon) through
    the real entry point, vs pow(a, 2^k, m)."""
    B = S * 128
    a = [RNG.randrange(m) for _ in range(B)]
    a[:3] = [0, 1, m - 1]
    k = 5
    with interpret_only():
        got = _real_ints(pk.mod_pow2k(_real_plane(a), k, m))
    assert got == [pow(x, 1 << k, m) for x in a]
