"""Pallas TPU kernels for the hot ops."""

from cubicsdr_tpu.ops.pallas.pfb import pfbch2_planar_pallas  # noqa: F401
