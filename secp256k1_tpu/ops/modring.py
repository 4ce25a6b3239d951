"""Batched modular arithmetic ring over u32 limb planes.

One `ModRing` instance each for the secp256k1 base field
(p = 2^256 - 2^32 - 977) and scalar ring (mod n); both are Solinas-friendly
(modulus = 2^256 - c with small c), so reduction is fold-based — no
Montgomery domain, unlike the reference
(`/root/reference/internal/fiat/secp256k1montgomery/secp256k1montgomery.go:34`).

Elements are canonical everywhere: shape [16, *batch] uint32, limbs < 2^16,
value < modulus.  Every op is branch-free and batched; the API mirrors the
reference's `internal/field/field.go:41-269` / `scalar.go:46-292` surface.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import limbs as lb

NLIMBS = lb.NLIMBS
DTYPE = lb.DTYPE


class ModRing:
    """Arithmetic mod m = 2^256 - c for small c, on [16, *batch] limb planes."""

    def __init__(self, modulus: int, name: str):
        assert modulus < (1 << 256)
        self.modulus = modulus
        self.name = name
        c = (1 << 256) - modulus
        n_c_limbs = (c.bit_length() + lb.LIMB_BITS - 1) // lb.LIMB_BITS
        self.c_limbs = lb.int_to_limbs(c, n_c_limbs)
        self.m_limbs = lb.int_to_limbs(modulus, NLIMBS)
        self.m17_limbs = lb.int_to_limbs(modulus, NLIMBS + 1)
        self.half_limbs = lb.int_to_limbs(modulus >> 1, NLIMBS)  # floor(m/2)

    # -- constructors -------------------------------------------------------

    def const(self, v: int, batch_shape=()):
        """Broadcast a python-int constant to a [16, *batch] element."""
        x = jnp.asarray(lb.int_to_limbs(v % self.modulus), dtype=DTYPE)
        return jnp.broadcast_to(
            x.reshape((NLIMBS,) + (1,) * len(batch_shape)),
            (NLIMBS,) + tuple(batch_shape))

    def zero(self, batch_shape=()):
        return jnp.zeros((NLIMBS,) + tuple(batch_shape), dtype=DTYPE)

    def one(self, batch_shape=()):
        return self.const(1, batch_shape)

    # -- ring ops -----------------------------------------------------------

    def add(self, a, b):
        s = lb.add(a, b, NLIMBS + 1)          # < 2m
        return lb.cond_sub(s, self.m17_limbs)[:NLIMBS]

    def sub(self, a, b):
        # a - b = a + (m - b); b canonical => m - b in [1, m], no borrow.
        m = jnp.asarray(self.m_limbs, dtype=DTYPE)
        m = m.reshape((NLIMBS,) + (1,) * (b.ndim - 1))
        d, _ = lb.sub_borrow(m + jnp.zeros_like(b), b)
        s = lb.add(a, d, NLIMBS + 1)          # < 2m
        return lb.cond_sub(s, self.m17_limbs)[:NLIMBS]

    def neg(self, b):
        m = jnp.asarray(self.m_limbs, dtype=DTYPE)
        m = m.reshape((NLIMBS,) + (1,) * (b.ndim - 1))
        d, _ = lb.sub_borrow(m + jnp.zeros_like(b), b)
        return lb.cond_sub(d, self.m_limbs)   # maps m (b=0) -> 0

    def mul(self, a, b):
        if self._pallas_ok(a, b):
            from .pallas import kernels as pk
            return pk.mod_mul(a, b, self.modulus)
        out = self._pallas_padded("mod_mul", a, b)
        if out is not None:
            return out
        return lb.mod_fold(lb.mul_wide(a, b), self.c_limbs)

    def square(self, a):
        if self._pallas_ok(a):
            from .pallas import kernels as pk
            return pk.mod_square(a, self.modulus)
        out = self._pallas_padded("mod_square", a)
        if out is not None:
            return out
        return lb.mod_fold(lb.square_wide(a), self.c_limbs)

    def _pallas_ok(self, *arrs) -> bool:
        from . import pallas
        if not pallas.enabled():
            return False
        from .pallas import kernels as pk
        return pk.compatible_shape(*arrs)

    def _pallas_padded(self, opname, *arrs):
        """Fused kernel on arbitrary batch shapes by padding up to the tiled
        [16, S, 128] layout (None when Pallas is off).  A padded 1024-lane
        launch costs ~tens of µs; the jnp fallback costs milliseconds on TPU
        — this keeps odd shapes (inversion trees, window folds) on the fast
        path."""
        from . import pallas
        if not pallas.enabled():
            return None
        from .pallas import kernels as pk
        x0 = arrs[0]
        batch = x0.shape[1:]
        bsize = 1
        for d in batch:
            bsize *= d
        padded = max(1024, ((bsize + 1023) // 1024) * 1024)

        def prep(p):
            f = p.reshape(NLIMBS, bsize)
            if padded != bsize:
                f = jnp.pad(f, ((0, 0), (0, padded - bsize)))
            return f.reshape(NLIMBS, padded // 128, 128)

        out = getattr(pk, opname)(*[prep(p) for p in arrs], self.modulus)
        return out.reshape(NLIMBS, padded)[:, :bsize].reshape(
            (NLIMBS,) + batch)

    def mul_word(self, a, w: int):
        """Multiply by small constant word (e.g. b3 = 21)."""
        return lb.mod_fold(lb.mul_word(a, w), self.c_limbs)

    def pow2k(self, x, k: int, unroll: int = 1):
        """x^(2^k) — k repeated squarings (k static).

        On the Pallas path this is a single fused launch with the whole
        chain in VMEM (ops/pallas kernels `mod_pow2k`); otherwise a
        fori_loop of squarings (small traced graph)."""
        assert k >= 1
        from . import pallas
        if k >= 2 and pallas.enabled():
            from .pallas import kernels as pk
            if pk.compatible_shape(x):
                return pk.mod_pow2k(x, k, self.modulus)
            out = self._pallas_padded_pow2k(x, k)
            if out is not None:
                return out
        if k <= unroll or k <= 2:
            for _ in range(k):
                x = self.square(x)
            return x
        return lax.fori_loop(0, k, lambda _, v: self.square(v), x)

    def _pallas_padded_pow2k(self, x, k):
        from . import pallas
        if not pallas.enabled():
            return None
        from .pallas import kernels as pk
        batch = x.shape[1:]
        bsize = 1
        for d in batch:
            bsize *= d
        padded = max(1024, ((bsize + 1023) // 1024) * 1024)
        f = x.reshape(NLIMBS, bsize)
        if padded != bsize:
            f = jnp.pad(f, ((0, 0), (0, padded - bsize)))
        out = pk.mod_pow2k(f.reshape(NLIMBS, padded // 128, 128), k,
                           self.modulus)
        return out.reshape(NLIMBS, padded)[:, :bsize].reshape(
            (NLIMBS,) + batch)

    def pow_const(self, x, e: int):
        """x^e for a static exponent, 4-bit fixed windows, uniform schedule.

        Cost ~ (4*ceil(bits/4)) squarings + (windows + 14) muls, all batched.
        Replaces the reference's addchain-generated exponentiations
        (`/root/reference/internal/field/field_invert.go:11`,
        `scalar_invert.go:11`) with a generic windowed form; the schedule is
        static (no data-dependent work), preserving the ct discipline.
        """
        assert e >= 1
        digits = []
        t = e
        while t > 0:
            digits.append(t & 0xF)
            t >>= 4
        digits = digits[::-1]                 # most-significant first
        # Precompute x^0..x^15 once (batched).
        tab = [self.one(x.shape[1:]), x]
        for _ in range(14):
            tab.append(self.mul(tab[-1], x))
        table = jnp.stack(tab, axis=0)        # [16, NLIMBS, *batch]

        acc = table[digits[0]]
        rest = jnp.asarray(digits[1:], dtype=jnp.int32)

        def body(acc, d):
            acc = self.pow2k(acc, 4, unroll=4)
            acc = self.mul(acc, lax.dynamic_index_in_dim(
                table, d, axis=0, keepdims=False))
            return acc, None

        if len(digits) > 1:
            acc, _ = lax.scan(body, acc, rest)
        return acc

    def pow_const_chain(self, x, e: int):
        """x^e via a run-decomposition addition chain.

        Exponents like p-2 / n-2 / (p-3)/4 are long runs of 1-bits; building
        x^(2^r - 1) values by the doubling ladder and composing runs gives
        ~bitlen squarings + ~15-40 multiplies — the same cost class as the
        reference's addchain-generated code
        (`/root/reference/internal/field/field_invert.go:11`, 255S+15M),
        ~20% cheaper than 4-bit windowed exponentiation.  All structure is
        static; squaring runs are `pow2k` (lax.fori_loop) so the traced
        graph stays small.
        """
        assert e >= 1
        bits = bin(e)[2:]
        # Decompose into (ones_run_length, zeros_after) segments, MSB first.
        runs = []
        i = 0
        while i < len(bits):
            j = i
            while j < len(bits) and bits[j] == "1":
                j += 1
            k = j
            while k < len(bits) and bits[k] == "0":
                k += 1
            runs.append((j - i, k - j))
            i = k
        assert runs and runs[0][0] >= 1

        built = {1: x}  # r -> x^(2^r - 1)

        def build(r):
            if r in built:
                return built[r]
            # Power-of-two doubling ladder + binary composition.
            p2 = 1
            while p2 * 2 <= r:
                if p2 * 2 not in built:
                    built[p2 * 2] = self.mul(
                        self.pow2k(built[p2], p2), built[p2])
                p2 *= 2
            if r not in built:
                rem = r - p2
                built[r] = self.mul(self.pow2k(built[p2], rem), build(rem))
            return built[r]

        ones0, zeros0 = runs[0]
        acc = build(ones0)
        pending_zeros = zeros0
        for ones, zeros in runs[1:]:
            acc = self.pow2k(acc, pending_zeros + ones)
            acc = self.mul(acc, build(ones))
            pending_zeros = zeros
        if pending_zeros:
            acc = self.pow2k(acc, pending_zeros)
        return acc

    def invert(self, x):
        """Fermat inverse x^(m-2); maps 0 -> 0 by construction, mirroring the
        reference contract (`/root/reference/internal/field/field_invert.go:11`)."""
        return self.pow_const_chain(x, self.modulus - 2)

    def invert_auto(self, x, min_batch: int = 2048):
        """`invert_batch` when the (static) batch is big enough to amortize
        the product tree, per-lane Fermat otherwise — the batch-size
        selection SURVEY.md §7 hard-part 5 calls for.  Same contract as
        `invert` (0 -> 0, uniform schedule) either way."""
        bsize = 1
        for d in x.shape[1:]:
            bsize *= d
        if bsize >= min_batch:
            return self.invert_batch(x)
        return self.invert(x)

    def invert_batch(self, x):
        """Montgomery batch inversion: ONE Fermat chain + ~3B multiplies.

        Product-tree up-sweep (log2 B levels of halving-width muls), a single
        width-1 Fermat inversion at the root, then a down-sweep where each
        child inverse is parent_inverse * sibling_product.  Work ~3B muls vs
        the ~270B limb-ops of per-lane Fermat — the batch-amortized form of
        the reference's per-point rescale inversion
        (`/root/reference/point_projective.go:278-302`).  Uniform schedule
        (no data-dependent work); zero lanes map to 0 like `invert`.
        """
        shape = x.shape
        flat = x.reshape(NLIMBS, -1)
        b = flat.shape[1]
        if b == 1:
            return self.invert(x)
        is_zero = lb.is_zero(flat)
        vals = lb.select(~is_zero, flat, self.one((b,)))
        # Pad to a power of two with ones (inert under multiplication).
        b_pad = 1 << (b - 1).bit_length()
        if b_pad != b:
            vals = jnp.concatenate(
                [vals, self.one((b_pad - b,))], axis=1)
        levels = [vals]
        while levels[-1].shape[1] > 1:
            cur = levels[-1]
            half = cur.shape[1] // 2
            levels.append(self.mul(cur[:, 0::2], cur[:, 1::2]))
        inv = self.invert(levels[-1])                      # [16, 1]
        for cur in levels[-2::-1]:
            # children (even, odd) of each parent: inv_even = pinv * odd,
            # inv_odd = pinv * even.
            even, odd = cur[:, 0::2], cur[:, 1::2]
            pinv = inv
            inv_even = self.mul(pinv, odd)
            inv_odd = self.mul(pinv, even)
            inv = jnp.stack([inv_even, inv_odd], axis=2).reshape(
                NLIMBS, cur.shape[1])
        inv = inv[:, :b]
        inv = lb.select(~is_zero, inv, self.zero((b,)))
        return inv.reshape(shape)

    def sum_lanes(self, x):
        """Reduce a batch to the modular sum of all lanes — the batched form
        of `Scalar.Sum` (`/root/reference/scalar.go:96`).  Returns [16, 1]."""
        flat = x.reshape(NLIMBS, -1)
        k = flat.shape[1]
        while k > 1:
            half = k // 2
            pair = self.add(flat[:, :half], flat[:, half:2 * half])
            if k % 2:
                pair = jnp.concatenate([pair, flat[:, 2 * half:]], axis=1)
            flat = pair
            k = flat.shape[1]
        return flat

    def product_lanes(self, x):
        """Modular product of all lanes — batched `Scalar.Product`
        (`/root/reference/scalar.go:104`).  Returns [16, 1]."""
        flat = x.reshape(NLIMBS, -1)
        k = flat.shape[1]
        while k > 1:
            half = k // 2
            pair = self.mul(flat[:, :half], flat[:, half:2 * half])
            if k % 2:
                pair = jnp.concatenate([pair, flat[:, 2 * half:]], axis=1)
            flat = pair
            k = flat.shape[1]
        return flat

    # -- predicates / selects ----------------------------------------------

    def is_zero(self, x):
        return lb.is_zero(x)

    def eq(self, a, b):
        return lb.eq(a, b)

    def is_odd(self, x):
        return (x[0] & 1) == 1

    def gt_half(self, x):
        """x > floor(m/2) — the reference's IsGreaterThanHalfN
        (`/root/reference/scalar.go:190`)."""
        # x > h  <=>  x >= h+1
        h1 = lb.int_to_limbs((self.modulus >> 1) + 1, NLIMBS)
        return lb.geq_const(x, h1)

    def select(self, mask, a, b):
        """mask ? a : b, per lane."""
        return lb.select(mask, a, b)

    def cneg(self, mask, x):
        """Negate where mask (branchless)."""
        return lb.select(mask, self.neg(x), x)

    # -- byte boundary ------------------------------------------------------

    def from_bytes_any(self, byts):
        """[32,*batch] u8/u32 big-endian bytes -> (reduced element, did_reduce).

        Mirrors `field.Element.SetBytes` semantics
        (`/root/reference/internal/field/field.go:115`): always reduces,
        returns a mask of lanes whose input was non-canonical (>= m).
        """
        x = self._bytes_to_limbs(byts)
        did_reduce = lb.geq_const(x, self.m_limbs)
        return lb.mod_fold(x, self.c_limbs), did_reduce

    def from_wide_bytes(self, byts):
        """[W<=64,*batch] big-endian bytes -> element (full mod reduction).

        The reference restricts W to 32..64 (`field_reduce.go:24`); here any
        width up to 64 works via the same fold machinery.
        """
        nb = byts.shape[0]
        assert nb <= 64
        x = self._bytes_to_limbs(byts)
        return lb.mod_fold(x, self.c_limbs)

    def to_bytes(self, x):
        """[16,*batch] canonical element -> [32,*batch] big-endian bytes (u32
        values 0..255)."""
        outs = []
        for i in range(NLIMBS - 1, -1, -1):
            outs.append(x[i] >> 8)
            outs.append(x[i] & 0xFF)
        return jnp.stack(outs, axis=0)

    def _bytes_to_limbs(self, byts):
        """[NB,*batch] big-endian bytes -> ceil(NB/2)-limb plane (LE limbs)."""
        b = byts.astype(DTYPE)
        nb = b.shape[0]
        outs = []
        for i in range((nb + 1) // 2):
            lo_idx = nb - 1 - 2 * i
            hi_idx = nb - 2 - 2 * i
            limb = b[lo_idx]
            if hi_idx >= 0:
                limb = limb | (b[hi_idx] << 8)
            outs.append(limb)
        return jnp.stack(outs, axis=0)

    def bytes_are_canonical(self, byts):
        """[32,*batch] -> mask: big-endian value < m
        (`/root/reference/internal/field/field.go:266`)."""
        x = self._bytes_to_limbs(byts)
        return ~lb.geq_const(x, self.m_limbs)
