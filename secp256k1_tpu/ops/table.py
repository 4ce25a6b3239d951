"""Windowed tables and fixed-base scalar multiplication.

TPU redesign of the reference's table engine
(`/root/reference/point_mul_table.go:30-211` + the SSE2 constant-time lookup
`point_mul_table_amd64.s:13-130`): tables are device-resident arrays, lookups
are branch-free masked reductions over the whole batch (every lane scans the
same schedule — the vectorized analog of the reference's ct table scan), and
the generator tables are *computed* (pure-int host math at import) rather
than shipped as a 510 KiB binary blob
(`/root/reference/internal/gentable/point_mul_table.go:16-55`).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import field as fe
from . import limbs as lb
from . import point as pt

P = fe.P
_GX, _GY = pt.GX, pt.GY


# ---------------------------------------------------------------------------
# Host-side table generation (python ints; runs once, cached).
# ---------------------------------------------------------------------------

def _aff_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow((x2 - x1) % P, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


@functools.cache
def gen_base_tables_np(window_bits: int = 4) -> np.ndarray:
    """Affine multiples of G for every window: [n_windows, n_entries, 2, 16].

    table[w][d-1] = d * 2^(window_bits*w) * G  (d in 1..2^w-1), the layout of
    the reference's `generatorOddAffineTable` / `hugeAffinePointMultTable`
    (`/root/reference/point_mul_table.go:73-160`).

    Persisted as .npy next to the package (the artifact-persistence analog
    of the reference's embedded 510 KiB table blob, except regenerable from
    first principles and cross-checked in tests/test_scalar_mult.py).
    """
    assert window_bits in (4, 8)
    cache_path = os.path.join(os.path.dirname(__file__), "..", "data",
                              f"gtable_w{window_bits}.npy")
    cache_path = os.path.abspath(cache_path)
    if os.path.exists(cache_path):
        t = np.load(cache_path)
        expect = (256 // window_bits, (1 << window_bits) - 1, 2, lb.NLIMBS)
        if t.shape == expect and t.dtype == np.uint32:
            return t
    n_windows = 256 // window_bits
    n_entries = (1 << window_bits) - 1
    out = np.zeros((n_windows, n_entries, 2, lb.NLIMBS), dtype=np.uint32)
    base = (_GX, _GY)
    for w in range(n_windows):
        acc = None
        for d in range(1, n_entries + 1):
            acc = _aff_add(acc, base)
            out[w, d - 1, 0] = lb.int_to_limbs(acc[0])
            out[w, d - 1, 1] = lb.int_to_limbs(acc[1])
        # base <- 2^window_bits * base
        for _ in range(window_bits):
            base = _aff_add(base, base)
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        np.save(cache_path, out)
    except OSError:
        pass
    return out


@functools.cache
def gen_base_tables_signed_np(window_bits: int = 8) -> np.ndarray:
    """Signed-window affine multiples of G:
    [ceil(256/window_bits) + 1, 2^(window_bits-1), 2, 16].

    table[w][d-1] = d * 2^(window_bits*w) * G for d in 1..2^(w-1) — half the
    entries of the unsigned form (negative digits are a y-negation at lookup
    time), so the one-hot MXU contraction is half as wide.  The extra last
    window absorbs the recoding carry out of the top window (its digit is
    always 0 or 1).
    """
    assert 4 <= window_bits <= 15
    cache_path = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "data",
        f"gtable_w{window_bits}s.npy"))
    n_windows = -(-256 // window_bits) + 1
    n_entries = 1 << (window_bits - 1)
    expect = (n_windows, n_entries, 2, lb.NLIMBS)
    if os.path.exists(cache_path):
        t = np.load(cache_path)
        if t.shape == expect and t.dtype == np.uint32:
            return t
    out = np.zeros(expect, dtype=np.uint32)
    base = (_GX, _GY)
    for w in range(n_windows):
        acc = None
        for d in range(1, n_entries + 1):
            acc = _aff_add(acc, base)
            out[w, d - 1, 0] = lb.int_to_limbs(acc[0])
            out[w, d - 1, 1] = lb.int_to_limbs(acc[1])
        for _ in range(window_bits):
            base = _aff_add(base, base)
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        np.save(cache_path, out)
    except OSError:
        pass
    return out


def _base_tables_device(window_bits: int):
    # NOTE: returns the cached *numpy* table (gen_base_tables_np is cached);
    # conversion to a device constant happens per-trace.  Caching a jnp array
    # here would leak tracers when first touched inside a jit trace.
    return gen_base_tables_np(window_bits)


def _raw_digits(k, window_bits: int, n_windows: int):
    """Unsigned window digits of a canonical scalar plane, ls-window first:
    [n_windows, *batch] u32 in [0, 2^window_bits)."""
    per_limb = lb.LIMB_BITS // window_bits
    digs = []
    for w in range(n_windows):
        limb = w // per_limb
        shift = (w % per_limb) * window_bits
        digs.append((k[limb] >> shift) & ((1 << window_bits) - 1))
    return jnp.stack(digs, axis=0)


def _raw_digits_any(k, window_bits: int, n_windows: int):
    """Unsigned window digits for widths that need not divide LIMB_BITS:
    window i spans bits [i*w, (i+1)*w), read across at most two limbs.
    [n_windows, *batch] u32 in [0, 2^window_bits)."""
    mask = jnp.uint32((1 << window_bits) - 1)
    digs = []
    for i in range(n_windows):
        bit = i * window_bits
        limb, shift = bit // lb.LIMB_BITS, bit % lb.LIMB_BITS
        v = k[limb] >> shift
        if shift + window_bits > lb.LIMB_BITS and limb + 1 < lb.NLIMBS:
            v = v | (k[limb + 1] << (lb.LIMB_BITS - shift))
        digs.append(v & mask)
    return jnp.stack(digs, axis=0)


def _signed_digits(k, window_bits: int = 8):
    """Canonical scalar plane -> [n_windows + 1, *batch] signed window
    digits, ls-window first.  Each u32 encodes magnitude (low 16 bits, in
    [0, 2^(w-1)]) and sign (bit 16); digit value = (-1)^sign * magnitude.
    Standard branch-free recoding: t in (2^(w-1), 2^w] becomes t - 2^w with
    carry 1 into the next window; the appended final window holds the
    carry out of the top window (0 or 1, always non-negative)."""
    n_windows = -(-256 // window_bits)
    half = jnp.uint32(1 << (window_bits - 1))
    full = jnp.uint32(1 << window_bits)
    if lb.LIMB_BITS % window_bits == 0:
        d = _raw_digits(k, window_bits, n_windows)
    else:
        d = _raw_digits_any(k, window_bits, n_windows)

    def body(c, di):
        t = di + c
        neg = t > half                       # t in [0, 2^w]
        mag = jnp.where(neg, full - t, t)    # t = 2^w -> mag 0
        out = mag | (neg.astype(jnp.uint32) << 16)
        return neg.astype(jnp.uint32), out

    carry, outs = lax.scan(body, jnp.zeros_like(d[0]), d)
    return jnp.concatenate([outs, carry[None]], axis=0)  # [W+1], ls-first


# ---------------------------------------------------------------------------
# Branch-free batched lookups.
# ---------------------------------------------------------------------------

def lookup_shared_affine(table_w, digits):
    """Constant-table lookup: table_w [n_entries, 2, 16], digits [*batch] in
    [0, n_entries]; digit d selects entry d-1; d = 0 returns garbage (entry 0)
    which the caller masks out — same contract as the reference's lookup with
    implicit identity (`point_mul_table_amd64.s:81`).

    Uses one-hot matmuls so the gather runs on the MXU.  TPU matmuls multiply
    in bf16 (8-bit mantissa), so 16-bit limb values are first split into
    8-bit halves — bf16-exact — and recombined after the f32-accumulated
    contraction (one term per output, so sums are exact too).  Both operands
    are fed as bf16 directly: 0/1 one-hots and 8-bit halves are bf16-exact,
    and an f32 operand would cost a 3x bf16-pass MXU decomposition.
    """
    e = table_w.shape[0]
    batch = digits.shape
    flat = table_w.reshape(e, -1)                              # [E, 32] u32
    lo = (flat & 0xFF).astype(jnp.bfloat16)
    hi = (flat >> 8).astype(jnp.bfloat16)
    d = digits.reshape(-1)
    onehot = (d[:, None] == (jnp.arange(e, dtype=d.dtype) + 1)[None, :]
              ).astype(jnp.bfloat16)
    sel_lo = jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
    sel_hi = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
    sel = (sel_lo.astype(jnp.uint32) | (sel_hi.astype(jnp.uint32) << 8))
    sel = sel.T.reshape(2, lb.NLIMBS, *batch)                  # [2, 16, *b]
    return sel[0], sel[1]


def lookup_shared_affine_all(tables, digits,
                             onehot_budget: int = 1 << 30):
    """All-windows variant of `lookup_shared_affine`: tables [W, E, 2, 16],
    digits [W, *batch] in [0, E] (0 selects the zero row).  One batched
    einsum (dot_general with a window batch dim) instead of W scanned
    matmuls — one MXU dispatch for the whole fixed-base selection.

    The [W, B, E] bf16 one-hot operand is materialized; wide windows at
    large batches can exceed HBM (e.g. w=12 at 64k lanes -> ~9 GB), so the
    einsum is chunked over the window axis to stay under `onehot_budget`
    bytes per dispatch (default 1 GiB; the w=8 64k default is ~0.5 GiB)."""
    w, e = tables.shape[0], tables.shape[1]
    batch = digits.shape[1:]
    flat = tables.reshape(w, e, -1)                            # [W, E, 32]
    lo = (flat & 0xFF).astype(jnp.bfloat16)
    hi = (flat >> 8).astype(jnp.bfloat16)
    d = digits.reshape(w, -1)
    bsz = d.shape[1]
    per_window = 2 * bsz * e                                   # one-hot bytes
    wchunk = max(1, min(w, onehot_budget // max(per_window, 1)))
    outs = []
    for w0 in range(0, w, wchunk):
        dc = d[w0:w0 + wchunk]
        onehot = (dc[:, :, None]
                  == (jnp.arange(e, dtype=d.dtype) + 1)[None, None, :]
                  ).astype(jnp.bfloat16)                       # [Wc, B, E]
        sel_lo = jnp.einsum("wbe,wec->wbc", onehot, lo[w0:w0 + wchunk],
                            preferred_element_type=jnp.float32)
        sel_hi = jnp.einsum("wbe,wec->wbc", onehot, hi[w0:w0 + wchunk],
                            preferred_element_type=jnp.float32)
        outs.append(sel_lo.astype(jnp.uint32)
                    | (sel_hi.astype(jnp.uint32) << 8))
    sel = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    sel = jnp.moveaxis(sel, -1, 1).reshape(w, 2, lb.NLIMBS, *batch)
    return sel[:, 0], sel[:, 1]


def lookup_lane_table(table, digits):
    """Per-lane table lookup: table [E, 3, 16, *batch] (stacked projective
    points, entry d-1 = d*P per lane), digits [*batch] in [0, E].

    Masked multiply-accumulate over the entry axis — the vectorized analog of
    the reference's SSE2 ct scan (C16): every lane reads every entry.
    """
    e = table.shape[0]
    idx = jnp.arange(1, e + 1, dtype=jnp.uint32)
    idx = idx.reshape((e,) + (1,) * (table.ndim - 1))
    mask = (digits[None, None, None] == idx).astype(jnp.uint32)
    sel = jnp.sum(table * mask, axis=0)                         # [3, 16, *b]
    return pt.Point(sel[0], sel[1], sel[2])


def build_lane_table(p: pt.Point, n_entries: int = 15):
    """[d*P for d in 1..n_entries] stacked as [E, 3, 16, *batch].

    1 doubling + (E-2) additions, batched over lanes — the analog of
    `newProjectivePointMultTable` (`/root/reference/point_mul_table.go:51`).
    The accumulation runs under `lax.scan` to keep the traced graph small
    (compile time), at no runtime cost.
    """
    p2 = pt.double(p)

    def body(acc, _):
        nxt = pt.add(acc, p)
        return nxt, jnp.stack([nxt.x, nxt.y, nxt.z], axis=0)

    _, rest = lax.scan(body, p2, None, length=n_entries - 2)
    first = jnp.stack([jnp.stack([p.x, p.y, p.z], axis=0),
                       jnp.stack([p2.x, p2.y, p2.z], axis=0)], axis=0)
    return jnp.concatenate([first, rest], axis=0)


# ---------------------------------------------------------------------------
# Fixed-base scalar multiplication.
# ---------------------------------------------------------------------------

# Signed-window fixed-base tables: 128-entry windows + per-lane y-negation
# instead of 255-entry unsigned — halves the one-hot MXU contraction and the
# selection traffic for one extra (carry) window.  A/B via env.
_BASE_SIGNED = os.environ.get("SECP256K1_TPU_BASE_SIGNED", "1") != "0"

# Signed-window width: wider windows cut the number of mixed adds
# (ceil(256/w)+1 of them) but grow the one-hot MXU contraction (2^(w-1)
# entries per window).  A/B via env.
_BASE_WINDOW = int(os.environ.get("SECP256K1_TPU_BASE_WINDOW", "8"))


def base_signed_enabled() -> bool:
    return _BASE_SIGNED


def set_base_signed(value: bool) -> None:
    global _BASE_SIGNED
    _BASE_SIGNED = bool(value)


def base_window() -> int:
    return _BASE_WINDOW


def set_base_window(value: int) -> None:
    global _BASE_WINDOW
    assert 4 <= value <= 15
    _BASE_WINDOW = int(value)


def _fused_base_ok(k, window_bits: int = 8, signed: bool = False):
    from . import pallas
    if not pallas.enabled():
        return False
    from .pallas import kernels as pk
    # The fused kernel keeps ALL windows' selx+sely planes resident in VMEM
    # per grid step: 2 * W * NLIMBS * blk_s * 128 lanes * 4 B.  Budget well
    # under the 16 MB scoped-VMEM limit (digits, outputs, and point-body
    # temporaries share it) — narrow windows (w4: 64-65 sel planes) fall
    # back to the jnp scan path rather than risk a runtime VMEM OOM.
    n_windows = (-(-256 // window_bits) + 1) if signed \
        else 256 // window_bits
    vmem = 2 * n_windows * lb.NLIMBS * pk.BLK_S * 128 * 4
    if vmem > 6 * 2**20:
        return False
    return k.ndim == 3 and pk.compatible_shape(k)


def _signed_selections(k, window_bits: int):
    """Digits + per-window one-hot MXU selections for the signed fixed-base
    path: (digits [W+1, *batch], sel_x, sel_y [W+1, 16, *batch])."""
    table = gen_base_tables_signed_np(window_bits)  # [W+1, 2^(w-1), 2, 16]
    digits = _signed_digits(k, window_bits)     # [W+1, *batch] mag | sign<<16
    mags = digits & jnp.uint32(0xFFFF)
    sel_x, sel_y = lookup_shared_affine_all(jnp.asarray(table), mags)
    return digits, sel_x, sel_y


def _scalar_base_mult_signed(k, window_bits: int = 8) -> pt.Point:
    """Signed-window k*G: ceil(256/w)+1 windows of 2^(w-1)-entry tables
    (magnitude lookup + conditional y-negation).  Same zero-doubling
    structure as the unsigned path; the recoding carry makes the extra
    window's digit 0 or 1."""
    if _fused_base_ok(k, window_bits, signed=True):
        from .pallas import kernels as pk
        digits, sel_x, sel_y = _signed_selections(k, window_bits)
        x, y, z = pk.base_windowed_add(digits, sel_x, sel_y,
                                       signed_digits=True)
        return pt.Point(x, y, z)

    table = gen_base_tables_signed_np(window_bits)  # [W+1, 2^(w-1), 2, 16]
    digits = _signed_digits(k, window_bits)     # [W+1, *batch] mag | sign<<16
    mags = digits & jnp.uint32(0xFFFF)

    signs = digits >> 16

    def body(acc, xs):
        tab_w, mag, sign = xs
        qx, qy = lookup_shared_affine(tab_w, mag)
        qy = jnp.where(sign[None] == 1, fe.neg(qy), qy)
        added = pt.add_mixed(acc, qx, qy)
        return pt.select(mag == 0, acc, added), None

    acc0 = pt.identity(k.shape[1:])
    acc, _ = lax.scan(body, acc0, (jnp.asarray(table), mags, signs))
    return acc


def scalar_base_mult(k, window_bits: int = 8) -> pt.Point:
    """k*G with per-window precomputed tables: zero doublings, one masked
    mixed-add per window — the batched version of `ScalarBaseMult`
    (`/root/reference/point_mul_table.go:168`, vartime 8-bit variant `:197`,
    here constant-schedule for any batch).

    k: [16, *batch] canonical scalar plane.  window_bits 4 => 64 adds;
    8 => 32 adds + a carry window (signed-window default; half-width
    lookups).  Under the signed default the effective width is
    `SECP256K1_TPU_BASE_WINDOW` (wider = fewer adds, bigger lookups).
    """
    if window_bits == 8 and _BASE_SIGNED:
        return _scalar_base_mult_signed(k, _BASE_WINDOW)
    table = _base_tables_device(window_bits)    # [W, E, 2, 16]
    n_windows = table.shape[0]
    digits = _raw_digits(k, window_bits, n_windows)   # [W, *batch]

    if _fused_base_ok(k, window_bits):
        # Phase 1 (XLA/MXU): one-hot matmul selections for every window,
        # stacked [W, 16, *batch].  Phase 2 (one Pallas launch): the 32
        # mixed-add accumulations with the accumulator resident in VMEM.
        from .pallas import kernels as pk
        sel_x, sel_y = lookup_shared_affine_all(table, digits)
        x, y, z = pk.base_windowed_add(digits, sel_x, sel_y)
        return pt.Point(x, y, z)

    def body(acc, xs):
        tab_w, dig = xs
        qx, qy = lookup_shared_affine(tab_w, dig)
        added = pt.add_mixed(acc, qx, qy)
        return pt.select(dig == 0, acc, added), None

    acc0 = pt.identity(k.shape[1:])
    acc, _ = lax.scan(body, acc0, (table, digits))
    return acc


def scalar_base_mult_add(k, q: pt.Point, window_bits: int = 8) -> pt.Point:
    """k*G + Q with the window accumulation and the trailing complete add in
    ONE Pallas launch — the ECDSA-verify tail u1*G + u2*P
    (`/root/reference/point_mul_glv.go:307-317`), saving the separate
    complete-add kernel and its HBM round-trip.  Falls back to
    `add(scalar_base_mult(k), Q)` off the fused path (same semantics)."""
    if window_bits == 8 and _BASE_SIGNED \
            and _fused_base_ok(k, _BASE_WINDOW, signed=True):
        from .pallas import kernels as pk
        digits, sel_x, sel_y = _signed_selections(k, _BASE_WINDOW)
        x, y, z = pk.base_windowed_add_final(digits, sel_x, sel_y,
                                             q.x, q.y, q.z,
                                             signed_digits=True)
        return pt.Point(x, y, z)
    return pt.add(scalar_base_mult(k, window_bits), q)
