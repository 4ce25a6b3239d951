"""Device-side batched kernels: limb arithmetic, field/scalar rings, curve
group ops, scalar multiplication engines, MSM, and hash-to-curve maps."""
