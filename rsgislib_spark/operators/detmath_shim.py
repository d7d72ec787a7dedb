"""Executor-side re-export of the deterministic math trees.

``operators.*`` kernels run inside Arrow workers; importing through
this shim keeps the operator modules' import graph flat."""
from ..functions.detmath import ln_pos_np as ln_pos  # noqa: F401
