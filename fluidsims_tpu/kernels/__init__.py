"""Pallas TPU kernels for the hot solver paths.

Each kernel shares its math with the corresponding solver module (the
kernel body calls the same step-core function on a VMEM-resident block), so
the jnp/XLA path and the Pallas path are verified by the same oracle tests.
"""
