"""Branch-free multi-limb (bignum) arithmetic on u32 limb planes.

The fundamental representation of every 256-bit quantity in this framework is
a *limb plane*: a ``uint32`` array of shape ``[L, *batch]`` holding ``L``
little-endian limbs of ``LIMB_BITS`` (=16) bits each.  The limb axis comes
first so the batch axis lands on TPU vector lanes (8x128 VPU registers); all
arithmetic below is element-wise over the batch and therefore vectorizes
across thousands of independent field/scalar elements per op.

Why 16-bit limbs in u32 (vs the reference's 4x64 saturated limbs,
`/root/reference/internal/fiat/secp256k1montgomery/secp256k1montgomery.go:46`):
TPUs have no 64-bit integer datapath and no add-with-carry; a 16x16->32 bit
product is exact in u32, and column sums of a 256x256-bit schoolbook multiply
(<= 32 terms < 2^16) stay < 2^21, so the whole multiply is carry-free until a
single final propagation pass.  This is the standard unsaturated-limb design
for SIMD bignum arithmetic, chosen per SURVEY.md §7 stance 2.

Everything here is data-oblivious: no data-dependent control flow, all
selects are `jnp.where` on masks — the TPU analog of the reference's
constant-time discipline (SURVEY.md §5 "race detection").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LIMB_BITS = 16
LIMB_MASK = 0xFFFF
DTYPE = jnp.uint32

# Number of limbs in a 256-bit element.
NLIMBS = 256 // LIMB_BITS  # 16


# ---------------------------------------------------------------------------
# Host-side conversions (numpy / python int) — used for constants and tests.
# ---------------------------------------------------------------------------

def int_to_limbs(v: int, n_limbs: int = NLIMBS) -> np.ndarray:
    """Python int -> little-endian 16-bit limbs, shape [n_limbs], uint32."""
    if v < 0:
        raise ValueError("negative")
    out = np.zeros((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = v & LIMB_MASK
        v >>= LIMB_BITS
    if v != 0:
        raise ValueError("value does not fit in n_limbs")
    return out


def limbs_to_int(x) -> int:
    """Little-endian limb vector (any batch-free shape [L]) -> python int."""
    x = np.asarray(x)
    assert x.ndim == 1
    v = 0
    for i in range(x.shape[0] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(x[i])
    return v


def int_to_limbs_batch(vals, n_limbs: int = NLIMBS) -> np.ndarray:
    """List of ints -> [n_limbs, B] uint32 limb plane."""
    return np.stack([int_to_limbs(v, n_limbs) for v in vals], axis=-1)


def limbs_to_int_batch(x) -> list:
    x = np.asarray(x)
    assert x.ndim == 2
    return [limbs_to_int(x[:, i]) for i in range(x.shape[1])]


# ---------------------------------------------------------------------------
# Device-side primitives (jnp, jittable, batch-agnostic).
# All inputs/outputs: uint32 arrays [L, *batch] with limbs < 2^16 unless noted.
# ---------------------------------------------------------------------------

def carry_prop(x, out_limbs: int | None = None):
    """Propagate carries so every limb < 2^16.

    `x`: [K, *batch] u32 with arbitrary limb values < 2^32 - 2^16 (so that
    limb + carry cannot overflow u32).  Returns [out_limbs, *batch] with the
    final carry folded into the top limbs; the caller must size `out_limbs`
    so the true value fits (no overflow checking on device).

    Implemented as a `lax.scan` over the limb axis: the ripple is inherently
    sequential, and a scan keeps the traced graph tiny (compile time) at
    identical runtime cost.
    """
    k = x.shape[0]
    if out_limbs is None:
        out_limbs = k + 1

    def body(carry, xi):
        t = xi + carry
        return t >> LIMB_BITS, t & LIMB_MASK

    carry, outs = lax.scan(body, jnp.zeros(x.shape[1:], dtype=DTYPE), x)
    if out_limbs > k:
        extra = []
        for _ in range(out_limbs - k):
            extra.append(carry & LIMB_MASK)
            carry = carry >> LIMB_BITS
        outs = jnp.concatenate([outs, jnp.stack(extra, axis=0)], axis=0)
    return outs[:out_limbs]


def add_raw(a, b):
    """Limb-wise add without carry propagation (column sums must stay <2^32)."""
    la, lb = a.shape[0], b.shape[0]
    if la == lb:
        return a + b
    if la < lb:
        a, b = b, a
        la, lb = lb, la
    pad = [(0, la - lb)] + [(0, 0)] * (b.ndim - 1)
    return a + jnp.pad(b, pad)


def add(a, b, out_limbs: int | None = None):
    """Full add with carry propagation. Default out width max(La,Lb)+1."""
    if out_limbs is None:
        out_limbs = max(a.shape[0], b.shape[0]) + 1
    return carry_prop(add_raw(a, b), out_limbs)


def _acc_add(acc, x, offset: int):
    """acc += x placed at limb offset (static), via pad+add (fusible on TPU,
    unlike scatter)."""
    la = acc.shape[0]
    lx = x.shape[0]
    pad = [(offset, la - offset - lx)] + [(0, 0)] * (x.ndim - 1)
    return acc + jnp.pad(x, pad)


def _mul_seg_ids(la: int, lb_: int):
    lo_ids = [i + j for i in range(la) for j in range(lb_)]
    hi_ids = [i + j + 1 for i in range(la) for j in range(lb_)]
    return np.asarray(lo_ids + hi_ids, dtype=np.int32)


def mul_wide(a, b):
    """Schoolbook product: [La,*B] x [Lb,*B] -> [La+Lb,*B], limbs < 2^16.

    Each 16x16->32 partial product is exact in u32; lo/hi 16-bit halves are
    column-summed with one segment-sum (sums < 2^21, carry-free) and a single
    carry propagation.  This is the innermost kernel of the jnp reference
    path — the TPU equivalent of the reference's fiat-crypto word-by-word
    Montgomery multiply
    (`/root/reference/internal/fiat/secp256k1montgomery/secp256k1montgomery.go:87`),
    except in plain (non-Montgomery) representation since reduction is done
    by Solinas folding (see `mod_fold`).  The hot TPU path is the fused
    Pallas kernel (ops/pallas/kernels.py); this formulation is optimized for
    small traced graphs.
    """
    la, lb_ = a.shape[0], b.shape[0]
    batch = a.shape[1:]
    p = a[:, None] * b[None, :]                      # [la, lb, *batch]
    lo = (p & LIMB_MASK).reshape((la * lb_,) + batch)
    hi = (p >> LIMB_BITS).reshape((la * lb_,) + batch)
    flat = jnp.concatenate([lo, hi], axis=0)
    cols = jax.ops.segment_sum(flat, _mul_seg_ids(la, lb_),
                               num_segments=la + lb_ + 1)
    return carry_prop(cols, la + lb_)


def square_wide(a):
    """Squaring; the jnp path reuses mul_wide (the Pallas kernel has the
    dedicated ~47%-fewer-multiplies version)."""
    return mul_wide(a, a)


def mul_word(a, w: int):
    """Multiply by a small compile-time word (w < 2^15), e.g. b3 = 21."""
    assert 0 <= w < (1 << 15)
    p = a * jnp.uint32(w)
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    acc = jnp.pad(lo, [(0, 1)] + [(0, 0)] * (a.ndim - 1))
    acc = _acc_add(acc, hi, 1)
    return carry_prop(acc, a.shape[0] + 1)


def mul_const(a, c_limbs: np.ndarray):
    """Multiply [La,*B] by a compile-time constant given as 16-bit limbs.

    Zero limbs of the constant are skipped at trace time, so e.g. the mod-p
    fold constant c = 2^32 + 977 (limbs [977, 0, 1]) costs two vector
    multiplies.  Result [La+Lc, *B], limbs < 2^16.
    """
    c = np.asarray(c_limbs, dtype=np.uint32)
    la, lc = a.shape[0], c.shape[0]
    batch = a.shape[1:]
    acc = jnp.zeros((la + lc,) + batch, dtype=DTYPE)
    for j in range(lc):
        if int(c[j]) == 0:
            continue
        p = a * jnp.uint32(int(c[j]))
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        acc = _acc_add(acc, lo, j)
        acc = _acc_add(acc, hi, j + 1)
    return carry_prop(acc, la + lc)


def sub_borrow(a, b):
    """a - b with borrow chain (lax.scan).  Returns (diff, borrow).

    Widths may differ (b zero-extended).  borrow is 1 where a < b.
    """
    la, lb_ = a.shape[0], b.shape[0]
    l = max(la, lb_)
    if la < l:
        a = jnp.pad(a, [(0, l - la)] + [(0, 0)] * (a.ndim - 1))
    if lb_ < l:
        b = jnp.pad(b, [(0, l - lb_)] + [(0, 0)] * (b.ndim - 1))

    def body(borrow, ab):
        ai, bi = ab
        t = ai + jnp.uint32(1 << LIMB_BITS) - bi - borrow
        return jnp.uint32(1) - (t >> LIMB_BITS), t & LIMB_MASK

    borrow, outs = lax.scan(body, jnp.zeros(a.shape[1:], dtype=DTYPE), (a, b))
    return outs, borrow


def cond_sub(x, m_limbs: np.ndarray):
    """Subtract constant m once if x >= m (branchless).  x: [L,*batch].

    Requires len(m_limbs) == x.shape[0].
    """
    m = jnp.asarray(m_limbs, dtype=DTYPE)
    assert m.shape[0] == x.shape[0]
    m = m.reshape((m.shape[0],) + (1,) * (x.ndim - 1))
    d, borrow = sub_borrow(x, m)
    return jnp.where((borrow != 0)[None], x, d)


def geq_const(x, m_limbs: np.ndarray):
    """x >= m (constant), branchless.  Returns bool [*batch]."""
    m = jnp.asarray(m_limbs, dtype=DTYPE)
    m = m.reshape((m.shape[0],) + (1,) * (x.ndim - 1))
    _, borrow = sub_borrow(x, m)
    return borrow == 0


def is_zero(x):
    """All limbs zero.  Returns bool [*batch]."""
    return jnp.all(x == 0, axis=0)


def eq(a, b):
    """Limb-wise equality of two canonical values. Returns bool [*batch]."""
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """Per-lane select: mask [*batch] bool -> a where True else b."""
    return jnp.where(mask[None], a, b)


def mod_fold(wide, c_limbs: np.ndarray, n_subs: int = 1):
    """Reduce `wide` mod m = 2^256 - c by Solinas folding (2^256 ≡ c).

    `wide`: [W, *batch] with W >= NLIMBS, limbs < 2^16.
    `c_limbs`: little-endian limbs of c (small: 3 limbs for p, 9 for n).
    Statically iterates `lo + hi*c` until width 17, then `n_subs` conditional
    subtracts of m.  Caller is responsible (with the fuzz tests in
    tests/test_limbs.py) for n_subs sufficing for its input bound; for all
    call sites in this package the post-fold value is < 2m so n_subs=1.

    Replaces both the reference's Montgomery reduction
    (`secp256k1montgomery.go:87`) and its 32..64-byte wide reduction
    (`/root/reference/internal/field/field_reduce.go:24`).
    """
    c = np.asarray(c_limbs, dtype=np.uint32)
    c_int = limbs_to_int(c)
    m_arr = int_to_limbs((1 << 256) - c_int, NLIMBS)

    x = wide
    while x.shape[0] > NLIMBS + 1:
        hi = x[NLIMBS:]
        lo = x[:NLIMBS]
        prod = mul_const(hi, c)
        x = add(lo, prod, max(NLIMBS, prod.shape[0]) + 1)
    if x.shape[0] == NLIMBS:
        pad = [(0, 1)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    # One final fold of the 17th limb: afterwards value < 2^256 + 2^16*c
    # < 2m, so a single conditional subtract canonicalizes.
    x = add(x[:NLIMBS], mul_const(x[NLIMBS:], c), NLIMBS + 1)
    m17 = np.zeros((NLIMBS + 1,), dtype=np.uint32)
    m17[:NLIMBS] = m_arr
    for _ in range(n_subs):
        x = cond_sub(x, m17)
    return x[:NLIMBS]
