"""Evaluation / generation layer (reference L5): sampling loops writing
reference-format npz files, rank-shard gathering, quantitative metrics."""

from slide_tpu.eval.generation import evaluate_per_rank, gather_generated_results

__all__ = ["evaluate_per_rank", "gather_generated_results"]
