"""tpu-secp256k1: a batch-first, TPU-native secp256k1 library in JAX.

Built from scratch against the capability surface of the Go reference
`Yawning/secp256k1-voi` (see SURVEY.md); all compute-path code is
JAX/XLA/Pallas over u32 limb planes, designed for TPU VPU/MXU execution and
multi-chip meshes.
"""

__version__ = "0.1.0"
