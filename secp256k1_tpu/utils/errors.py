"""Per-lane status codes — the batched analog of the reference's sentinel
error taxonomy (`/root/reference/point_s11n.go:58-62`,
`/root/reference/secec/ecdsa.go:26-36`, `secec/s11n.go:31-37`).

Device kernels return int32 status planes; host wrappers map them to Python
exceptions / error strings per lane.
"""

OK = 0
ERR_INVALID_ENCODING = 1      # malformed/non-canonical encoding (errInvalidAsn1Sig etc.)
ERR_NOT_ON_CURVE = 2          # decompression/decode failed curve membership
ERR_INVALID_PUBLIC_KEY = 3    # identity / invalid public key
ERR_INVALID_SCALAR = 4        # non-canonical or zero scalar (errInvalidScalar)
ERR_INVALID_DIGEST = 5        # digest length mismatch (errInvalidDigest)
ERR_INVALID_SIGNATURE = 6     # r/s out of range or zero (errInvalidRorS)
ERR_VERIFY_FAILED = 7         # generic verification failure (Schnorr etc.)
ERR_INVALID_RECOVERY_ID = 8
ERR_MALLEABLE = 9             # s > n/2 when RejectMalleable
ERR_R_IS_INFINITY = 10        # u1*G + u2*Q = identity (errRIsInfinity)
ERR_V_NEQ_R = 11              # x(R) mod n != r (errVNeqR)

MESSAGES = {
    OK: "ok",
    ERR_INVALID_ENCODING: "invalid encoding",
    ERR_NOT_ON_CURVE: "point not on curve",
    ERR_INVALID_PUBLIC_KEY: "invalid public key",
    ERR_INVALID_SCALAR: "invalid scalar",
    ERR_INVALID_DIGEST: "invalid digest",
    ERR_INVALID_SIGNATURE: "invalid signature",
    ERR_VERIFY_FAILED: "signature verification failed",
    ERR_INVALID_RECOVERY_ID: "invalid recovery id",
    ERR_MALLEABLE: "malleable signature rejected",
    ERR_R_IS_INFINITY: "R is the point at infinity",
    ERR_V_NEQ_R: "v does not equal r",
}

# Verification-failure class: every code a failed ECDSA/Schnorr verify can
# produce (the reference's errVNeqR/errRIsInfinity family).
VERIFY_FAILURES = frozenset(
    {ERR_VERIFY_FAILED, ERR_R_IS_INFINITY, ERR_V_NEQ_R})
