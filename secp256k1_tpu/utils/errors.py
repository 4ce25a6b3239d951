"""Per-lane status codes — the batched analog of the reference's sentinel
error taxonomy (`/root/reference/point_s11n.go:58-62`,
`/root/reference/secec/ecdsa.go:26-36`, `secec/s11n.go:31-37`).

Device kernels return int32 status planes; host wrappers map them to Python
exceptions / error strings per lane.
"""

OK = 0
ERR_INVALID_ENCODING = 1      # malformed/non-canonical encoding
ERR_NOT_ON_CURVE = 2          # decompression/decode failed curve membership
ERR_INVALID_PUBLIC_KEY = 3    # identity / invalid public key
ERR_INVALID_SCALAR = 4        # non-canonical or zero scalar where forbidden
ERR_INVALID_DIGEST = 5        # digest length mismatch
ERR_INVALID_SIGNATURE = 6     # r/s out of range or zero
ERR_VERIFY_FAILED = 7         # signature verification failed
ERR_INVALID_RECOVERY_ID = 8
ERR_MALLEABLE = 9             # s > n/2 when RejectMalleable

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
}
