"""Pallas TPU kernels for the hot paths (Mosaic-compiled).

The XLA wavefront ops materialize every [N_rays, P_prims] intermediate in
HBM; these kernels keep the primitive tables resident in VMEM and tile the
ray wavefront over the grid, so the sweeps run at VPU/MXU speed with HBM
traffic limited to the ray state itself.

Layout rules (learned the hard way — see VERDICT r2 on the round-2 kernel):
  * every BlockSpec last dim is a multiple of 128, second-to-last of 8
  * rays ride in SUBLANES (8..64 per compute tile), prims in LANES (128)
  * no per-lane gathers in-kernel: tables are contracted via one-hot
    matmuls on the MXU or statically sliced from VMEM
"""

from pathtracer_tpu.kernels.dense import (  # noqa: F401
    pallas_dense_available,
    pallas_intersect_dense,
    pallas_intersect_any_dense,
)
