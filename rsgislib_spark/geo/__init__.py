"""Pure-python/numpy geo kernel: no Spark imports here.

Everything in this package is deterministic arithmetic that must match the
reference semantics exactly; it is unit-tested directly and reused inside
Arrow-vectorized UDFs by the operators layer.
"""
