"""Pure-python-int ground truth for differential fuzzing of the limb kernels.

This is the analog of the reference's `scalarMultTrivial` oracle discipline
(`/root/reference/point_test.go:392-416`): every optimized batched kernel is
cross-checked against a deliberately naive implementation over Python ints.
"""

P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
B = 7


def inv_mod(x, m):
    return pow(x, m - 2, m)


# --- affine curve ops (None = identity) ------------------------------------

def affine_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * inv_mod(2 * y1, P) % P
    else:
        lam = (y2 - y1) * inv_mod((x2 - x1) % P, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def affine_double(p1):
    return affine_add(p1, p1)


def affine_mul(k, p1):
    acc = None
    while k:
        if k & 1:
            acc = affine_add(acc, p1)
        p1 = affine_double(p1)
        k >>= 1
    return acc


def on_curve(p1):
    if p1 is None:
        return True
    x, y = p1
    return (y * y - x * x * x - B) % P == 0


GEN = (GX, GY)
