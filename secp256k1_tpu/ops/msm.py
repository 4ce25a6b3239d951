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
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import field as fe
from . import limbs as lb
from . import point as pt

NLIMBS = lb.NLIMBS


def _pt_stack(p: pt.Point):
    return jnp.stack([p.x, p.y, p.z], axis=0)          # [3, 16, *batch]


def _pt_unstack(a) -> pt.Point:
    return pt.Point(a[0], a[1], a[2])


def _seg_combine(a, b):
    """Segmented-sum combiner: elements are (new_segment_flag, point_stack).

    Associative: (f1,v1) op (f2,v2) = (f1|f2, f2 ? v2 : v1+v2)."""
    f1, v1 = a
    f2, v2 = b
    added = _pt_stack(pt.add(_pt_unstack(v1), _pt_unstack(v2)))
    v = jnp.where(f2[None, None, :], v2, added)
    return f1 | f2, v


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


def _bucket_accumulate(points_stacked, digits, n_buckets: int):
    """One window's bucket sums: [n_buckets, 3, 16] point stacks.

    points_stacked: [3, 16, N]; digits: [N] u32.
    Sort by digit, segmented-scan point sums, scatter segment tails."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sorted_digits = digits[order]
    sorted_points = points_stacked[:, :, order]

    # Segment starts: position 0 or digit change.
    prev = jnp.concatenate([sorted_digits[:1] + 1, sorted_digits[:-1]])
    seg_start = sorted_digits != prev

    _, summed = lax.associative_scan(
        _seg_combine, (seg_start, sorted_points), axis=-1)

    # Segment tails hold the full per-digit sums.
    nxt = jnp.concatenate([sorted_digits[1:], sorted_digits[-1:] + 1])
    is_tail = sorted_digits != nxt

    # Scatter: buckets[digit] = tail_sum where is_tail.  Lanes that are not
    # tails write to a trash bucket (index n_buckets, dropped).  Untouched
    # buckets stay the identity and flow through the complete formulas.
    idx = jnp.where(is_tail, sorted_digits, jnp.uint32(n_buckets))
    buckets = _pt_stack(pt.identity((n_buckets + 1,)))
    buckets = buckets.at[:, :, idx].set(summed)        # scatter over last axis
    return buckets[:, :, :n_buckets]


def _weighted_bucket_sum(buckets):
    """sum_{b>=1} b * bucket_b via reverse cumulative point-sum + reduction.

    buckets: [3, 16, n_buckets] stacks.  S_j = sum_{b>=j} bucket_b;
    result = sum_{j>=1} S_j."""
    rev = buckets[:, :, ::-1]
    csum = lax.associative_scan(
        lambda a, b: _pt_stack(pt.add(_pt_unstack(a), _pt_unstack(b))),
        rev, axis=-1)                                   # suffix sums, reversed
    suffix = csum[:, :, ::-1]                           # S_0 ... S_{K-1}
    # Drop S_0 (bucket 0 contributes nothing) and tree-reduce the rest.
    terms = suffix[:, :, 1:]
    k = terms.shape[-1]
    while k > 1:
        half = k // 2
        left = terms[:, :, :half]
        right = terms[:, :, half:2 * half]
        pair = _pt_stack(pt.add(_pt_unstack(left), _pt_unstack(right)))
        if k % 2:
            pair = jnp.concatenate([pair, terms[:, :, 2 * half:]], axis=-1)
        terms = pair
        k = terms.shape[-1]
    return _pt_unstack(terms[:, :, 0])


def pippenger_window_sums(scalars, points: pt.Point, window_bits: int):
    """Per-window weighted bucket sums W_w: [n_windows] points (stacked).

    This is the shard-local piece: on a mesh each device runs it on its slice
    of points and the W_w (tiny) are combined across devices."""
    n_buckets = 1 << window_bits
    digits = _digits(scalars, window_bits)              # [W, N]
    stacked = _pt_stack(points)                          # [3, 16, N]

    def per_window(dig):
        buckets = _bucket_accumulate(stacked, dig, n_buckets)
        w = _weighted_bucket_sum(buckets)
        return _pt_stack(w)

    return lax.map(per_window, digits)                  # [W, 3, 16]


def combine_windows(window_sums, window_bits: int) -> pt.Point:
    """Horner fold: result = sum_w 2^(c*w) W_w, msw first."""
    n_windows = window_sums.shape[0]

    def body(acc, wsum):
        for _ in range(window_bits):
            acc = pt.double(acc)
        acc = pt.add(acc, _pt_unstack(wsum))
        return acc, None

    acc0 = pt.identity(())
    acc, _ = lax.scan(body, acc0, window_sums[::-1])    # most-significant first
    return acc


def multi_scalar_mult(scalars, points: pt.Point,
                      window_bits: int = 8) -> pt.Point:
    """sum_i scalars[:, i] * points[i] — single-instance MSM.

    scalars: [16, N] canonical planes; points: Point with batch (N,).
    Jittable end-to-end; O(N log N) sort + O(N log N) point-add work in
    O(log) depth.  The TPU answer to `MultiScalarMult`
    (`/root/reference/point_mul_multi.go:25`) and the reference's missing
    Pippenger."""
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
    def body2(carry, dig):
        acc_lanes = carry                                # Point batch (N,)
        for _ in range(4):
            acc_lanes = pt.double(acc_lanes)
        sel = tbl.lookup_lane_table(lane_tables, dig)
        added = pt.add(acc_lanes, sel)
        acc_lanes = pt.select(dig == 0, acc_lanes, added)
        return acc_lanes, None

    acc, _ = lax.scan(body2, pt.identity((n,)), digits[::-1])
    # Final cross-lane reduction to a single point.
    stacked = _pt_stack(acc)
    k = n
    while k > 1:
        half = k // 2
        pair = _pt_stack(pt.add(_pt_unstack(stacked[:, :, :half]),
                                _pt_unstack(stacked[:, :, half:2 * half])))
        if k % 2:
            pair = jnp.concatenate([pair, stacked[:, :, 2 * half:]], axis=-1)
        stacked = pair
        k = stacked.shape[-1]
    return _pt_unstack(stacked[:, :, 0])
