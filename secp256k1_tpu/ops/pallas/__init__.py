"""Pallas TPU kernel package + runtime dispatch switch.

`enabled()` decides whether the fused kernels are used: forced by
SECP256K1_TPU_PALLAS=0/1, otherwise on exactly when the default JAX backend
is a TPU.  Call sites additionally require the [16, S%BLK_S==0, 128] layout
(`kernels.compatible_shape`); anything else falls back to the jnp limb path,
which remains the differential reference implementation.
"""

from __future__ import annotations

import os

_ENABLED = None


def enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        flag = os.environ.get("SECP256K1_TPU_PALLAS")
        if flag == "0":
            _ENABLED = False
        elif flag == "1":
            _ENABLED = True
        else:
            try:
                import jax
                _ENABLED = jax.default_backend() not in ("cpu",)
            except Exception:
                _ENABLED = False
    return _ENABLED


def set_enabled(value) -> None:
    """Override at runtime (None = re-detect)."""
    global _ENABLED
    _ENABLED = value
