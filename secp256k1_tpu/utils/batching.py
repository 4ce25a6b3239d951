"""Host<->device batch marshalling.

Chooses the device layout for limb planes: flat [16, B] on CPU, tiled
[16, B/128, 128] when the Pallas kernels are active (their grid walks
8-sublane slabs, so B is padded to a multiple of 1024 there).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import limbs as lb
from ..ops import pallas as pk


def _tiled() -> bool:
    return pk.enabled()


def bucket(n: int, min_bucket: int = 16, max_bucket: int = 1 << 20) -> int:
    """Padded batch size for n lanes (power of two; >= 1024 when tiled).

    Raises when n exceeds max_bucket: plane()/byte_plane() would otherwise
    silently truncate-pad and the arrays paths would return wrong-length
    outputs.  Callers that handle arbitrary n chunk at a higher level
    (models/ecdsa.py chunk_lanes / service.VerifyService)."""
    if n > max_bucket:
        raise ValueError(
            f"batch of {n} lanes exceeds max_bucket={max_bucket}; "
            "chunk the input (e.g. config chunk_lanes) instead")
    b = 1024 if _tiled() else min_bucket
    while b < n:
        b <<= 1
    return b


def auto_chunk(n: int, chunk_lanes: int | None,
               max_bucket: int = 1 << 20) -> int | None:
    """Resolve a chunk size for n lanes: keep an explicit chunk_lanes, else
    chunk at max_bucket when n exceeds a single launch (so arrays paths
    never hit bucket()'s max_bucket guard)."""
    if chunk_lanes is None and n > max_bucket:
        return max_bucket
    return chunk_lanes


def batch_shape(b: int):
    if _tiled():
        assert b % 1024 == 0
        return (b // 128, 128)
    return (b,)


def pad_vals(vals, b, fill):
    return list(vals) + [fill] * (b - len(vals))


def plane(ints, b: int, fill: int = 0):
    """List of ints -> [16, *batch_shape(b)] u32 device plane."""
    arr = lb.int_to_limbs_batch(pad_vals(ints, b, fill))
    return jnp.asarray(arr.reshape((16,) + batch_shape(b)))


def byte_plane(chunks, b: int, fill: bytes | None = None):
    """List of byte strings (equal width) -> [W, *batch_shape(b)] u8 plane."""
    w = len(chunks[0]) if chunks else len(fill)
    if fill is None:
        fill = b"\x00" * w
    arr = np.zeros((w, b), dtype=np.uint8)
    for i, c in enumerate(pad_vals(chunks, b, fill)):
        arr[:, i] = np.frombuffer(c, dtype=np.uint8)
    return jnp.asarray(arr.reshape((w,) + batch_shape(b)))


def scalar_plane(vals, b: int, fill=0, dtype=jnp.int32):
    """List of scalars -> [*batch_shape(b)] device array."""
    arr = np.asarray(pad_vals(list(vals), b, fill), dtype=dtype)
    return jnp.asarray(arr.reshape(batch_shape(b)))


def byte_plane_np(arr: np.ndarray, b: int) -> "jnp.ndarray":
    """[n, W] u8 numpy array -> [W, *batch_shape(b)] u8 device plane.

    Vectorized (no per-lane Python) — the end-to-end marshalling path;
    lanes beyond n are filled by repeating the last row (keeps the device
    batch well-formed without branching)."""
    n, w = arr.shape
    assert n <= b
    if n < b:
        arr = np.concatenate(
            [arr, np.repeat(arr[-1:], b - n, axis=0)], axis=0)
    return jnp.asarray(
        np.ascontiguousarray(arr.T).reshape((w,) + batch_shape(b)))


def unplane_ints(x, n: int):
    """[16, *batch] plane -> first n ints."""
    return lb.limbs_to_int_batch(np.asarray(x).reshape(16, -1)[:, :n])


def unplane_bytes(x, n: int):
    """[W, *batch] u8/u32 plane -> first n byte strings."""
    arr = np.asarray(x).astype(np.uint8).reshape(x.shape[0], -1)
    return [arr[:, i].tobytes() for i in range(n)]


def unplane_flags(x, n: int):
    """[*batch] plane -> first n python scalars."""
    return list(np.asarray(x).reshape(-1)[:n])
