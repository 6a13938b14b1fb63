"""Shape-As-Points subsystem (reference `pointnet2/dpsr_utils/` +
`train_upsampler.py` + `dpsr_evaluation.py`): differentiable Poisson surface
reconstruction on XLA FFTs, symmetry mirroring, refine+upsample glue, and
host-side iso-surface extraction."""

from slide_tpu.sap.dpsr import DPSR, point_rasterize, grid_interp, fftfreqs, \
    spec_gaussian_filter
from slide_tpu.sap.mirror import mirror, mirror_and_concat, down_sample_points
from slide_tpu.sap.refine import (shapenet_psr_normalize,
                                  network_output_to_dpsr_grid)
from slide_tpu.sap.marching import (marching_tetrahedra, mc_from_psr,
                                    mc_from_device_psr)

__all__ = [
    "DPSR", "point_rasterize", "grid_interp", "fftfreqs",
    "spec_gaussian_filter", "mirror", "mirror_and_concat",
    "down_sample_points", "shapenet_psr_normalize",
    "network_output_to_dpsr_grid", "marching_tetrahedra", "mc_from_psr",
    "mc_from_device_psr",
]
