"""Numerics kernels: eigensystems, reconstruction, Riemann solvers, CT."""
