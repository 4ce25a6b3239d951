"""Multi-scalar multiplication: batched Straus and jittable Pippenger.

The reference offers a 4-bit Straus interleaving
(`/root/reference/point_mul_multi.go:25-117`) and explicitly lists Pippenger
as unimplemented headroom (`README.md:87-91`).  Here Pippenger is the
centerpiece, redesigned for XLA's static-shape model (SURVEY.md §7 stage 7):

- digit decomposition is dense [W, N] tensors;
- bucket accumulation is sort + *segmented associative scan* with the
  complete point-add as the (associative) combiner — O(log N) depth, every
  level a full-width batched point addition;
- bucket aggregation (sum_b b*bucket_b) is a reverse associative scan over
  buckets plus a tree reduction;
- window combination is Horner with c doublings per window.

No data-dependent shapes anywhere: empty buckets hold the identity and flow
through the complete formulas.

Layout note: the scan pipeline works on plane stacks [3, 16, N] (limb-first,
batch last) so every point-add maps straight onto the fused kernels with no
transposes; bucket arrays and window sums use small [K, 3, 16] row stacks at
the boundaries (scatter axis leading).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import limbs as lb
from . import point as pt

NLIMBS = lb.NLIMBS


def _rows_to_point(v) -> pt.Point:
    """[K, 3, 16] row stack -> Point batch (K,)."""
    return pt.Point(v[:, 0].T, v[:, 1].T, v[:, 2].T)


def _point_to_rows(p: pt.Point):
    return jnp.stack([p.x.T, p.y.T, p.z.T], axis=1)


def _planes_to_point(v) -> pt.Point:
    """[3, 16, K] plane stack -> Point batch (K,) (no data movement)."""
    return pt.Point(v[0], v[1], v[2])


def _point_to_planes(p: pt.Point):
    return jnp.stack([p.x, p.y, p.z], axis=0)


def _planes_add(v1, v2):
    """Point-add two [3, 16, K] plane stacks (fused kernel on TPU)."""
    return _point_to_planes(pt.add(_planes_to_point(v1), _planes_to_point(v2)))


def _rows_add(v1, v2):
    """Point-add two [K, 3, 16] row stacks (transposing layout shim for the
    cross-device reductions in parallel/sharded.py)."""
    return _point_to_rows(pt.add(_rows_to_point(v1), _rows_to_point(v2)))


def _seg_combine(left, right):
    """Segmented-sum combine on (flag [K], planes [3, 16, K])."""
    f_l, v_l = left
    f_r, v_r = right
    added = _planes_add(v_l, v_r)
    return f_l | f_r, jnp.where(f_r[None, None, :], v_r, added)


def _segmented_point_scan(flags, planes):
    """Inclusive segmented prefix point-sum, work-efficient (~2N point adds
    in O(log N) depth via pairwise recursion), in plane layout [3, 16, N]:
    no transposes between levels, so every add is a straight fused-kernel
    launch on TPU.

    flags: [N] bool, True where a new segment starts.  Position i gets the
    point-sum of its segment's prefix; segment tails hold full sums."""
    n = planes.shape[-1]
    if n == 1:
        return planes
    if n % 2:  # pad with a fresh singleton segment (dropped after)
        flags = jnp.concatenate([flags, jnp.ones((1,), dtype=bool)])
        planes = jnp.concatenate([planes, planes[..., -1:]], axis=-1)
        return _segmented_point_scan(flags, planes)[..., :n]
    f_e, v_e = flags[0::2], planes[..., 0::2]
    f_o, v_o = flags[1::2], planes[..., 1::2]
    # Pair sums, then scan the half-size problem.
    pf, pv = _seg_combine((f_e, v_e), (f_o, v_o))     # N/2 adds
    if pv.shape[-1] == 1:
        sv_pairs = pv
    else:
        sv_pairs = _segmented_point_scan(pf, pv)
    out_odd = sv_pairs
    prev = sv_pairs[..., :-1]
    prev_f = jnp.zeros((prev.shape[-1],), dtype=bool)
    _, out_even_tail = _seg_combine((prev_f, prev),
                                    (f_e[1:], v_e[..., 1:]))  # N/2-1 adds
    out_even = jnp.concatenate([v_e[..., :1], out_even_tail], axis=-1)
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(planes.shape)
    return out


def _digits(scalars, window_bits: int):
    """[16, N] scalar plane -> [n_windows, N] digit tensor (ls window first)."""
    per_limb = lb.LIMB_BITS // window_bits
    n_windows = 256 // window_bits
    digs = []
    for w in range(n_windows):
        limb = w // per_limb
        shift = (w % per_limb) * window_bits
        digs.append((scalars[limb] >> shift) & ((1 << window_bits) - 1))
    return jnp.stack(digs, axis=0)


def _signed_digits(scalars, window_bits: int):
    """[16, N] scalar plane -> [n_windows+1, N] signed-window digits
    (ls window first), each u32 encoding magnitude (bits 0-5, in
    [0, 2^w/2]) | sign << 6.  Digit value = (-1)^sign * magnitude; the
    extra final window absorbs the recoding carry.  Cross-limb extraction
    supports window widths that don't divide the 16-bit limb size."""
    assert window_bits <= 6
    n_windows = (256 + window_bits - 1) // window_bits
    mask = jnp.uint32((1 << window_bits) - 1)
    digs = []
    for w in range(n_windows):
        bit = w * window_bits
        limb, sh = bit // 16, bit % 16
        v = scalars[limb] >> sh
        if sh + window_bits > 16 and limb + 1 < NLIMBS:
            v = v | (scalars[limb + 1] << (16 - sh))
        digs.append(v & mask)
    d = jnp.stack(digs, axis=0)
    half = jnp.uint32(1 << (window_bits - 1))

    def body(c, di):
        t = di + c
        neg = t > half                        # t in [0, 2^w]
        mag = jnp.where(neg, jnp.uint32(1 << window_bits) - t, t)
        out = mag | (neg.astype(jnp.uint32) << 6)
        return neg.astype(jnp.uint32), out

    carry, outs = lax.scan(body, jnp.zeros_like(d[0]), d)
    return jnp.concatenate([outs, carry[None]], axis=0)


def _bucket_accumulate(point_planes, digits, n_buckets: int):
    """One window's bucket sums as [n_buckets, 3, 16] rows.

    point_planes: [3, 16, N]; digits: [N] u32.
    Sort by digit, segmented-scan point sums, scatter segment tails."""
    order = jnp.argsort(digits)
    sorted_digits = digits[order]
    sorted_planes = point_planes[..., order]

    # Segment starts: position 0 or digit change.
    prev = jnp.concatenate([sorted_digits[:1] + 1, sorted_digits[:-1]])
    seg_start = sorted_digits != prev

    summed = _segmented_point_scan(seg_start, sorted_planes)

    # Segment tails hold the full per-digit sums.
    nxt = jnp.concatenate([sorted_digits[1:], sorted_digits[-1:] + 1])
    is_tail = sorted_digits != nxt

    # Scatter tails into buckets (trash slot n_buckets for non-tails);
    # untouched buckets stay the identity.
    idx = jnp.where(is_tail, sorted_digits, jnp.uint32(n_buckets))
    buckets = _point_to_rows(pt.identity((n_buckets + 1,)))
    buckets = buckets.at[idx].set(jnp.moveaxis(summed, -1, 0))
    return buckets[:n_buckets]


def _weighted_bucket_sum(buckets):
    """sum_{b>=1} b * bucket_b via reverse cumulative point-sum + reduction.

    buckets: [K, 3, 16] rows.  S_j = sum_{b>=j} bucket_b; result =
    sum_{j>=1} S_j, returned as a [3, 16] row."""
    planes = jnp.moveaxis(buckets, 0, -1)                # [3, 16, K]
    rev = planes[..., ::-1]
    csum = _segmented_point_scan(
        jnp.zeros((rev.shape[-1],), dtype=bool), rev)
    suffix = csum[..., ::-1]                             # S_0 ... S_{K-1}
    terms = suffix[..., 1:]                              # drop S_0
    k = terms.shape[-1]
    while k > 1:
        half = k // 2
        pair = _planes_add(terms[..., :half], terms[..., half:2 * half])
        if k % 2:
            pair = jnp.concatenate([pair, terms[..., 2 * half:]], axis=-1)
        terms = pair
        k = terms.shape[-1]
    return terms[..., 0]


def _lane_merge(buckets_lanes):
    """[K, 3, 16, S, 128] per-lane-slot buckets -> [K, 3, 16] rows via a
    pairwise point-add tree over the lane-slot axis (batched adds, K*slots
    total add-lanes — negligible next to the accumulation)."""
    k = buckets_lanes.shape[0]
    v = buckets_lanes.reshape(k, 3, NLIMBS, -1)          # [K, 3, 16, M]
    v = jnp.moveaxis(v, 0, -2)                           # [3, 16, K, M]
    m = v.shape[-1]
    while m > 1:
        half = m // 2
        left = v[..., :half].reshape(3, NLIMBS, -1)
        right = v[..., half:2 * half].reshape(3, NLIMBS, -1)
        pair = _planes_add(left, right).reshape(3, NLIMBS, k, half)
        if m % 2:
            pair = jnp.concatenate([pair, v[..., 2 * half:]], axis=-1)
        v = pair
        m = v.shape[-1]
    return jnp.moveaxis(v[..., 0], -1, 0)                # [K, 3, 16]


def _window_sums_fused(scalars, points: pt.Point, window_bits: int):
    """Pallas bucket-accumulation path: ONE launch for every window, no
    sort/gather; see kernels.msm_bucket_accumulate_all.  w <= 4 uses unsigned
    digits (2^w - 1 buckets); w in (5, 6) uses signed digits (2^(w-1)
    buckets + a carry window) to keep the accumulator VMEM-resident."""
    from .pallas import kernels as pk
    # Unsigned w=4 measured fastest at 2^20 (827k pts/s) vs signed w=4
    # (789k) and signed w=6 (640k): the signed variants' per-step y-negate
    # is a serial borrow chain that costs more than the smaller bucket
    # scan saves, and wider windows grow the masked scan faster than they
    # shrink the window count.  Signed stays available for w in (5, 6)
    # where unsigned buckets wouldn't fit VMEM.
    signed = window_bits > 4
    if signed:
        n_buckets = 1 << (window_bits - 1)
        digits = _signed_digits(scalars, window_bits)    # [W+1, N]
    else:
        n_buckets = (1 << window_bits) - 1               # digits 1..2^w-1
        digits = _digits(scalars, window_bits)           # [W, N]
    n = points.x.shape[-1]
    s = n // 128
    digs = digits.reshape(digits.shape[0], s, 128)
    px = points.x.reshape(NLIMBS, s, 128)
    py = points.y.reshape(NLIMBS, s, 128)
    pz = points.z.reshape(NLIMBS, s, 128)

    # ONE launch for all windows (grid = (W, S/blk), window-major), then a
    # single batched lane merge over W*nb bucket rows and a vmapped
    # weighted sum.  The earlier per-window lax.scan re-dispatched the
    # kernel + merge 64 times; its overhead grew superlinearly with N
    # (2^22 measured ~4x the pure kernel time).
    w = digs.shape[0]
    lanes_all = pk.msm_bucket_accumulate_all(digs, px, py, pz, n_buckets,
                                             signed_digits=signed)
    blk = lanes_all.shape[-2]
    buckets = _lane_merge(
        lanes_all.reshape(w * n_buckets, 3, NLIMBS, blk, 128))
    buckets = buckets.reshape(w, n_buckets, 3, NLIMBS)
    # _weighted_bucket_sum indexes buckets by digit: restore slot 0.
    ident = jnp.broadcast_to(_point_to_rows(pt.identity((1,))),
                             (w, 1, 3, NLIMBS))
    wsums = jax.vmap(_weighted_bucket_sum)(
        jnp.concatenate([ident, buckets], axis=1))
    return wsums                                         # [W(+1), 3, 16]


def _fused_msm_ok(points: pt.Point, window_bits: int) -> bool:
    # w <= 4: 15-bucket unsigned accumulator (~3 MB VMEM); w in (5, 6):
    # signed digits keep it at 16/32 buckets.  w = 8 unsigned would need a
    # 255-bucket, ~50 MB scratch.
    from . import pallas
    if not pallas.enabled() or window_bits not in (4, 5, 6):
        return False
    n = points.x.shape[-1]
    return points.x.ndim == 2 and n >= 2048 and n % 1024 == 0


def pippenger_window_sums(scalars, points: pt.Point, window_bits: int):
    """Per-window weighted bucket sums: [n_windows, 3, 16] rows.

    This is the shard-local piece: on a mesh each device runs it on its slice
    of points and the (tiny) window sums are combined across devices."""
    if _fused_msm_ok(points, window_bits):
        return _window_sums_fused(scalars, points, window_bits)

    assert lb.LIMB_BITS % window_bits == 0, \
        "sort+scan path needs window_bits dividing the limb size"
    n_buckets = 1 << window_bits
    digits = _digits(scalars, window_bits)               # [W, N]
    point_planes = _point_to_planes(points)              # [3, 16, N]

    def per_window(dig):
        buckets = _bucket_accumulate(point_planes, dig, n_buckets)
        return _weighted_bucket_sum(buckets)

    return lax.map(per_window, digits)                   # [W, 3, 16]


def combine_windows(window_sums, window_bits: int) -> pt.Point:
    """Horner fold: result = sum_w 2^(c*w) W_w, msw first.
    window_sums: [W, 3, 16] rows."""
    def body(acc, wsum):
        for _ in range(window_bits):
            acc = pt.double(acc)
        acc = pt.add(acc, pt.Point(wsum[0], wsum[1], wsum[2]))
        return acc, None

    acc0 = pt.identity(())
    acc, _ = lax.scan(body, acc0, window_sums[::-1])     # most-significant 1st
    return acc


def multi_scalar_mult(scalars, points: pt.Point,
                      window_bits: int | None = None) -> pt.Point:
    """sum_i scalars[:, i] * points[i] — single-instance MSM.

    scalars: [16, N] canonical planes; points: Point with batch (N,).
    Jittable end-to-end.  The TPU answer to `MultiScalarMult`
    (`/root/reference/point_mul_multi.go:25`) and the reference's missing
    Pippenger.  window_bits=None auto-selects: 4 when the fused Pallas
    bucket-accumulation path applies (one add per point per window, buckets
    VMEM-resident), else the sort + segmented-scan formulation at 8 for
    large N / 4 for small."""
    if window_bits is None:
        if _fused_msm_ok(points, 4):
            window_bits = 4                 # signed digits, 8 buckets
        else:
            window_bits = 8 if points.x.shape[-1] >= (1 << 14) else 4
    wsums = pippenger_window_sums(scalars, points, window_bits)
    return combine_windows(wsums, window_bits)


def multi_scalar_mult_straus(scalars, points: pt.Point) -> pt.Point:
    """4-bit Straus interleaving — direct analog of the reference's MSM
    (`point_mul_multi.go:25-71`); better for small N (< ~64)."""
    from . import table as tbl
    n = points.x.shape[-1]
    lane_tables = tbl.build_lane_table(points)           # [15, 3, 16, N]
    digits = _digits(scalars, 4)                         # [64, N]

    # Accumulate per-lane k_i * P_i under the shared window schedule, then
    # tree-reduce the lanes to one point.
    def body(carry, dig):
        acc_lanes = carry                                # Point batch (N,)
        for _ in range(4):
            acc_lanes = pt.double(acc_lanes)
        sel = tbl.lookup_lane_table(lane_tables, dig)
        added = pt.add(acc_lanes, sel)
        acc_lanes = pt.select(dig == 0, acc_lanes, added)
        return acc_lanes, None

    acc, _ = lax.scan(body, pt.identity((n,)), digits[::-1])
    rows = _point_to_rows(acc)
    k = n
    while k > 1:
        half = k // 2
        pair = _rows_add(rows[:half], rows[half:2 * half])
        if k % 2:
            pair = jnp.concatenate([pair, rows[2 * half:]], axis=0)
        rows = pair
        k = rows.shape[0]
    return pt.Point(rows[0, 0], rows[0, 1], rows[0, 2])