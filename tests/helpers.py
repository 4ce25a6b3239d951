"""Shared test helpers: fixed-size batches + cached jitted ops.

Every test runs ops through `jax.jit` at a standard batch size so each op
compiles exactly once per pytest session (and persists in the compilation
cache across sessions).
"""

import functools
import random

import numpy as np
import jax

from secp256k1_tpu.ops import limbs as lb

B_TEST = 64  # standard test batch width


def pad_vals(vals, b=B_TEST):
    """Pad a list of ints to length b by repeating; returns (padded, n)."""
    n = len(vals)
    assert n <= b, f"test batch too large: {n} > {b}"
    return vals + [vals[-1]] * (b - n), n


def as_batch(vals, n_limbs=16):
    return np.asarray(lb.int_to_limbs_batch(vals, n_limbs))


def from_batch(x):
    return lb.limbs_to_int_batch(np.asarray(x))


@functools.cache
def jitted(fn, *static):
    return jax.jit(fn, static_argnums=tuple(static)) if static else jax.jit(fn)


def run1(fn, vals, n_limbs=16):
    """Run a unary limb-plane op over padded batch; return ints (trimmed)."""
    padded, n = pad_vals(list(vals))
    out = jitted(fn)(as_batch(padded, n_limbs))
    return from_batch(out)[:n]


def run2(fn, a_vals, b_vals, n_limbs=16):
    a_p, n = pad_vals(list(a_vals))
    b_p, _ = pad_vals(list(b_vals) + [b_vals[-1]] * (len(a_vals) - len(b_vals))
                      if len(b_vals) < len(a_vals) else list(b_vals))
    out = jitted(fn)(as_batch(a_p, n_limbs), as_batch(b_p, n_limbs))
    return from_batch(out)[:n]


def rng(seed=1234):
    return random.Random(seed)
