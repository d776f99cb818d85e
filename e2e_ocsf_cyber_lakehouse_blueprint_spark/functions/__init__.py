"""Vectorized kernels Catalyst lacks (Arrow-batch pandas UDFs) + analysis functions."""
