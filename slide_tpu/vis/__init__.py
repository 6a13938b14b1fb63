"""Visualization / export layer (reference `visualization_tools/` +
`dpsr_utils/io_utils.py`): PLY mesh/point-cloud writers (no external deps) and
npz -> .xyz visualization dumps."""

from slide_tpu.vis.ply import save_mesh_ply, save_pcd_ply, batch_save_pcd
from slide_tpu.vis.pcd import visualize_pcd, visualize_hierarchical_pcd

__all__ = ["save_mesh_ply", "save_pcd_ply", "batch_save_pcd",
           "visualize_pcd", "visualize_hierarchical_pcd"]
