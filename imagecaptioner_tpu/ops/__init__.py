"""Compute ops: decode loops, losses, Pallas kernels."""
