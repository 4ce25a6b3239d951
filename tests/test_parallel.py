"""Multi-device sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4 testing implications: the reference offers no distributed
precedent; these validate the mesh/pjit/shard_map paths the TPU build adds —
data-parallel verify and the sharded Pippenger MSM with its all_gather
window-sum reduction.
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

import gold
from helpers import as_batch, jitted, rng
from secp256k1_tpu.ops import limbs as lb
from secp256k1_tpu.ops import point as pt
from secp256k1_tpu.parallel import mesh as meshmod
from secp256k1_tpu.parallel import sharded

RNG = rng(4242)


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_verify_matches():
    from secp256k1_tpu.models import codecs, ecdsa, keys
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256

    mesh = meshmod.data_mesh(8)
    b = 16
    priv = keys.PrivateKey(0xDEADBEEF)
    digest = hashlib.sha256(b"shard me").digest()
    sig = ecdsa.sign(priv, digest, rand=RFC6979SHA256())
    r_i, s_i = codecs.parse_asn1_signature(sig)
    e_i = ecdsa.hash_to_scalar_int(digest)

    def plane(v):
        return jnp.asarray(lb.int_to_limbs_batch([v] * b))

    args = (plane(priv.public_key.point[0]), plane(priv.public_key.point[1]),
            plane(e_i), plane(r_i), plane(s_i))
    args = meshmod.shard_batch(mesh, args)
    verify = sharded.sharded_verify_fn(mesh)
    status = np.asarray(verify(*args))
    assert (status == 0).all()
    # flipped r must fail on every lane
    bad = (args[0], args[1], args[2], plane((r_i + 1) % gold.N), args[4])
    assert (np.asarray(verify(*bad)) != 0).all()


def test_sharded_msm_matches_gold():
    mesh = meshmod.data_mesh(8)
    n = 32
    ks = [RNG.randrange(gold.N) for _ in range(n)]
    pts = [gold.affine_mul(RNG.randrange(1, gold.N), gold.GEN)
           for _ in range(n)]
    want = None
    for k, p in zip(ks, pts):
        want = gold.affine_add(want, gold.affine_mul(k, p))
    result = sharded.sharded_msm(mesh, as_batch(ks),
                                 pt.from_affine_ints(pts), window_bits=4)
    aff = jitted(pt.to_affine)(result)
    got = (lb.limbs_to_int(np.asarray(aff.x).reshape(16)),
           lb.limbs_to_int(np.asarray(aff.y).reshape(16)))
    assert got == want


def test_sharded_msm_split_matches_fused():
    """The local/combine split used for per-stage scaling timing must
    compose to exactly the fused sharded MSM."""
    mesh = meshmod.data_mesh(4)
    n = 16
    ks = [RNG.randrange(gold.N) for _ in range(n)]
    pts = [gold.affine_mul(RNG.randrange(1, gold.N), gold.GEN)
           for _ in range(n)]
    fused = sharded.sharded_msm(mesh, as_batch(ks),
                                pt.from_affine_ints(pts), window_bits=4)
    lfn, cfn = sharded.sharded_msm_split_jits(mesh, window_bits=4)
    split = cfn(lfn(as_batch(ks), pt.from_affine_ints(pts)))
    f_aff = jitted(pt.to_affine)(fused)
    s_aff = jitted(pt.to_affine)(split)
    assert np.array_equal(np.asarray(f_aff.x), np.asarray(s_aff.x))
    assert np.array_equal(np.asarray(f_aff.y), np.asarray(s_aff.y))


def test_init_distributed_forwards_args(monkeypatch):
    # Multi-host init is a thin jax.distributed.initialize wrapper; assert
    # the kwargs pass through verbatim (the only machine-testable contract
    # without a second host).
    import jax
    from secp256k1_tpu.parallel import mesh as meshmod
    seen = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: seen.update(kw))
    meshmod.init_distributed(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=2)
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}


def test_graft_entry_dryrun():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
