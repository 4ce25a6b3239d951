"""tpu-secp256k1: a batch-first, TPU-native secp256k1 library in JAX.

Built from scratch against the capability surface of the Go reference
`Yawning/secp256k1-voi` (see SURVEY.md): field/scalar arithmetic on u32 limb
planes, complete projective group law, GLV/table/Pippenger scalar
multiplication, ECDSA (RFC 6979, recovery), BIP-0340 Schnorr, ECDH, SEC1 +
ASN.1/BIP-0066 codecs, and RFC 9380 hash-to-curve — every compute path
batched over TPU lanes, fused Pallas kernels on the hot ops, and mesh-
sharded execution for multi-chip/multi-host scale.

Quick start (single-key convenience API; the batched `*_batch` functions in
`secp256k1_tpu.models.*` are the throughput path):

    from secp256k1_tpu import keys, ecdsa
    priv = keys.generate_key()
    sig = ecdsa.sign(priv, digest)
    assert ecdsa.verify(priv.public_key, digest, sig)
"""

__version__ = "0.1.0"

from .models import bitcoin, codecs, ecdh, ecdsa, h2c, keys, schnorr  # noqa: F401
from .models.keys import PrivateKey, PublicKey, generate_key  # noqa: F401
from .models.rfc6979 import RFC6979SHA256  # noqa: F401
from .models.schnorr import SchnorrPrivateKey, SchnorrPublicKey  # noqa: F401
from .utils.config import BatchConfig, ECDSAOptions, SignatureEncoding  # noqa: F401
