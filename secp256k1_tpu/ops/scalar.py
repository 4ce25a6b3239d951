"""secp256k1 scalar ring GF(n), batched on limb planes.

TPU-native equivalent of the reference's `Scalar` type
(`/root/reference/scalar.go:46-292`, `scalar_invert.go:11`): mod-n ring ops,
canonical byte boundary with `did_reduce` masks, Fermat inversion
(Invert(0)=0), and the `IsGreaterThanHalfN` malleability predicate.
"""

from __future__ import annotations

from .modring import ModRing

N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

S = ModRing(N, "secp256k1-scalar")

add = S.add
sub = S.sub
neg = S.neg
mul = S.mul
square = S.square
pow2k = S.pow2k
pow_const = S.pow_const
invert = S.invert
invert_batch = S.invert_batch
invert_auto = S.invert_auto
is_zero = S.is_zero
eq = S.eq
is_odd = S.is_odd
select = S.select
cneg = S.cneg
const = S.const
zero = S.zero
one = S.one
from_bytes_any = S.from_bytes_any
from_wide_bytes = S.from_wide_bytes
to_bytes = S.to_bytes
bytes_are_canonical = S.bytes_are_canonical

# s > n/2 — used for low-s malleability checks
# (`/root/reference/scalar.go:190`).
is_greater_than_half_n = S.gt_half
