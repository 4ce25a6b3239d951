"""Differential tests of the Pallas kernel *bodies* on CPU.

The kernel bodies (`ops/pallas/kernels.py`) are pure jnp functions over lists
of [s, 128] u32 rows, so they can be cross-checked against python ints
without TPU hardware or interpret mode — both the u32 schoolbook and the
f32-FMA 8-bit-limb variants must agree with the ground truth bit-exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops.pallas import kernels as pk
from helpers import rng

RNG = rng(77)
S, L = 2, 128  # tiny tiled block: 256 lanes
B = S * L


def _vals(m, k=B):
    edge = [0, 1, 2, m - 1, m - 2, 2**255 % m, (m >> 1) + 1]
    vals = edge + [RNG.randrange(m) for _ in range(k - len(edge))]
    return vals[:k]


def _to_rows(vals):
    plane = lb.int_to_limbs_batch(vals)         # [16, B]
    return [jnp.asarray(plane[i].reshape(S, L)) for i in range(16)]


def _from_rows(rows):
    plane = np.stack([np.asarray(r).reshape(B) for r in rows], axis=0)
    return lb.limbs_to_int_batch(plane)


def _consts(m):
    return (pk._CP, pk._M17P) if m == pk.P else (pk._CN, pk._M17N)


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
@pytest.mark.parametrize("body,n_args", [
    (pk._mul_rows_f32, 2), (pk._sqr_rows_f32, 1),
], ids=["mul_f32", "sqr_f32"])
def test_mod_bodies(m, body, n_args):
    # Only the f32-FMA variants run on CPU: the u32 schoolbook bodies are
    # the round-1-validated baseline and XLA:CPU compiles of these unrolled
    # graphs are expensive; tools/bench_kernels.py + the TPU probe cover
    # both variants bit-exactly on hardware.
    c_limbs, m17 = _consts(m)
    a = _vals(m)
    b = _vals(m, B)[::-1]

    def run(*rows_lists):
        return jnp.stack(body(*rows_lists, c_limbs, m17), axis=0)

    if n_args == 2:
        got_rows = jax.jit(run)(_to_rows(a), _to_rows(b))
        want = [x * y % m for x, y in zip(a, b)]
    else:
        got_rows = jax.jit(run)(_to_rows(a))
        want = [x * x % m for x in a]
    got = lb.limbs_to_int_batch(np.asarray(got_rows).reshape(16, B))
    assert got == want


# NOTE: the fused *point* bodies (12 modmuls unrolled) are deliberately NOT
# compiled on XLA:CPU — a single such module takes >10 minutes to compile
# there.  They are validated on real hardware by tools/tpu_selftest.py
# (point add/double/double4/lookup-add/glv_windowed_mult vs the python-int
# host oracle) plus the full KAT pipelines.


# --- Lazy-reduction (semi-canonical) primitives -----------------------------
#
# Inputs range over the FULL semi-canonical domain [0, 2^256) — not just
# [0, m) — because that is the invariant the fused kernels maintain between
# chained ops under lazy reduction.

_M256 = 2**256


def _semi_vals(k=B):
    edge = [0, 1, 2, pk.P - 1, pk.P, pk.P + 1, pk.N, pk.N + 1,
            _M256 - 1, _M256 - 2, _M256 - 2**33, 2**255, 2**129]
    vals = edge + [RNG.randrange(_M256) for _ in range(k - len(edge))]
    return vals[:k]


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
def test_relaxed_add_sub_mulw(m):
    c_limbs, m17 = _consts(m)
    m2 = pk._2M17P if m == pk.P else pk._2M17N
    a = _semi_vals()
    b = _semi_vals()[::-1]
    ar, br = _to_rows(a), _to_rows(b)

    got = _from_rows(jax.jit(
        lambda x, y: jnp.stack(pk._add_rows_relaxed(x, y, c_limbs)))(ar, br))
    assert all(g < _M256 and g % m == (x + y) % m
               for g, x, y in zip(got, a, b))

    got = _from_rows(jax.jit(
        lambda x, y: jnp.stack(pk._sub_rows_relaxed(x, y, c_limbs, m2))
    )(ar, br))
    assert all(g < _M256 and g % m == (x - y) % m
               for g, x, y in zip(got, a, b))

    got = _from_rows(jax.jit(
        lambda x: jnp.stack(pk._mul_word_rows_relaxed(x, pk.B3, c_limbs))
    )(ar))
    assert all(g < _M256 and g % m == (x * pk.B3) % m
               for g, x in zip(got, a))

    # Kernel-output canonicalization: semi-canonical -> canonical.
    got = _from_rows(jax.jit(lambda x: jnp.stack(pk._canon(x, m17)))(ar))
    assert all(g < m and g == x % m for g, x in zip(got, a))


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
def test_relaxed_mul_sqr_f32(m):
    c_limbs, m17 = _consts(m)
    a = _semi_vals()
    b = _semi_vals()[::-1]
    ar, br = _to_rows(a), _to_rows(b)

    got = _from_rows(jax.jit(
        lambda x, y: jnp.stack(
            pk._mul_rows_f32(x, y, c_limbs, m17, canonical=False)))(ar, br))
    assert all(g < _M256 and g % m == (x * y) % m
               for g, x, y in zip(got, a, b))

    got = _from_rows(jax.jit(
        lambda x: jnp.stack(
            pk._sqr_rows_f32(x, c_limbs, m17, canonical=False)))(ar))
    assert all(g < _M256 and g % m == (x * x) % m for g, x in zip(got, a))


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
def test_mul_u8_variant(m):
    """The split-operand u8 schoolbook (`SECP256K1_TPU_MULV=u8`) on the
    full semi-canonical domain, both lazy modes, vs python ints."""
    c_limbs, m17 = _consts(m)
    s, k = 1, 128
    a = _semi_vals(k)
    b = _semi_vals(k)[::-1]

    def rows(vals):
        plane = lb.int_to_limbs_batch(vals)
        return [jnp.asarray(plane[i].reshape(s, k)) for i in range(16)]

    def ints(rs):
        plane = np.stack([np.asarray(r).reshape(k) for r in rs], axis=0)
        return lb.limbs_to_int_batch(plane)

    ar, br = rows(a), rows(b)
    got = ints(jax.jit(
        lambda x, y: jnp.stack(
            pk._mul_rows_u8(x, y, c_limbs, m17, canonical=False)))(ar, br))
    assert all(g < _M256 and g % m == (x * y) % m
               for g, x, y in zip(got, a, b))
    got = ints(jax.jit(
        lambda x, y: jnp.stack(
            pk._mul_rows_u8(x, y, c_limbs, m17, canonical=True)))(ar, br))
    assert all(g < m and g == (x * y) % m for g, x, y in zip(got, a, b))


@pytest.mark.parametrize("m", [pk.P, pk.N], ids=["p", "n"])
def test_relaxed_mul_sqr_u32(m):
    """The production hot path (_F32_POINT=0) uses the u32 schoolbook bodies;
    cover both lazy modes on the full semi-canonical domain:
    canonical=False (lazy chaining) must stay < 2^256 and correct mod m, and
    canonical=True on semi-canonical inputs (the set_lazy(False) mixed-mode
    case) must fully reduce.  One tiny [1, 128] block keeps the XLA:CPU
    compile of the unrolled schoolbook ~20s."""
    c_limbs, m17 = _consts(m)
    s, k = 1, 128
    a = _semi_vals(k)
    b = _semi_vals(k)[::-1]

    def rows(vals):
        plane = lb.int_to_limbs_batch(vals)
        return [jnp.asarray(plane[i].reshape(s, k)) for i in range(16)]

    def ints(rs):
        plane = np.stack([np.asarray(r).reshape(k) for r in rs], axis=0)
        return lb.limbs_to_int_batch(plane)

    ar, br = rows(a), rows(b)
    got = ints(jax.jit(
        lambda x, y: jnp.stack(
            pk._mul_rows(x, y, c_limbs, m17, canonical=False)))(ar, br))
    assert all(g < _M256 and g % m == (x * y) % m
               for g, x, y in zip(got, a, b))

    got = ints(jax.jit(
        lambda x: jnp.stack(
            pk._sqr_rows(x, c_limbs, m17, canonical=True)))(ar))
    assert all(g < m and g == (x * x) % m for g, x in zip(got, a))
