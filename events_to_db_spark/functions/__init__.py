"""Reusable function-layer code: Arrow-vectorized numeric kernels and
text helpers shared by the operator modules."""
