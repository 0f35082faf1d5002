"""Device compute ops: descriptor matching, SIFT kernels, batched solvers."""
