"""Auxiliary subsystems (SURVEY.md §5): scalar logging (tensorboard-free),
profiling hooks, model-size reporting, averaging meters."""

from slide_tpu.utils.logging import ScalarLogger, AverageMeter
from slide_tpu.utils.profiling import StepTimer, trace_profile
from slide_tpu.utils.model_utils import print_size, param_count
from slide_tpu.utils.checks import assert_tree_finite, tree_nonfinite_paths

__all__ = ["ScalarLogger", "AverageMeter", "StepTimer", "trace_profile",
           "print_size", "param_count", "assert_tree_finite",
           "tree_nonfinite_paths"]
