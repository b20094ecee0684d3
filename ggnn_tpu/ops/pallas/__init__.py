"""Pallas TPU kernels for the framework's hot ops.

The XLA scatter-add behind `segment_sum` measures ~20x off the HBM floor
on the packed-batch shapes (see ops/pallas/ell_spmm.py); these kernels
replace it with MXU matmuls over a blocked-ELL edge layout.
"""

from ggnn_tpu.ops.pallas.ell_spmm import (
    ell_aggregate_by_type,
    ell_aggregate_by_type_reference,
    ell_scatter_sum,
    ell_scatter_sum_reference,
)
