"""Scalar/array/pixel function layer (numpy kernels + Spark wrappers)."""
