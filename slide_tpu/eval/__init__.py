"""Evaluation / generation layer (reference L5): sampling loops writing
reference-format npz files, rank-shard gathering, quantitative metrics."""

from slide_tpu.eval.generation import evaluate_per_rank, gather_generated_results
from slide_tpu.eval.metrics import (emd_cd, pairwise_emd_cd, knn_classifier,
                                    lgan_mmd_cov, compute_all_metrics,
                                    jsd_between_point_cloud_sets)
from slide_tpu.eval.mesh_recon import (sap_grid_eval, reconstruct_meshes,
                                       merge_current_with_previous_eval_results,
                                       plot_result)

__all__ = ["evaluate_per_rank", "gather_generated_results", "sap_grid_eval",
           "emd_cd", "pairwise_emd_cd", "knn_classifier", "lgan_mmd_cov",
           "compute_all_metrics", "jsd_between_point_cloud_sets",
           "reconstruct_meshes", "merge_current_with_previous_eval_results",
           "plot_result"]
