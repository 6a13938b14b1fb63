"""Flax building blocks (the reference's `pointnet2_ops` neural layer, L1 in
SURVEY.md §1, re-designed channels-last for TPU).

All modules operate on channels-last tensors: point features (B, N, C),
grouped neighborhoods (B, M, K, C).  1x1 "convs" are Dense layers over the
channel axis — XLA maps them to MXU matmuls with the (M*K) dimension as rows.
"""

from slide_tpu.nn.layers import (
    TailGroupNorm,
    SharedMLP,
    InjectionMLP,
    calc_t_emb,
    swish,
    torch_kernel_init,
)
from slide_tpu.nn.neighborhood import query_and_group, group_knn_features
from slide_tpu.nn.attention import AttentionPool, GlobalAttention
from slide_tpu.nn.modules import (
    SAModule,
    FPModule,
    KnnFPModule,
    FeatureMapModule,
)
from slide_tpu.nn.pnet import PNet2Stage

__all__ = [
    "TailGroupNorm", "SharedMLP", "InjectionMLP", "calc_t_emb", "swish",
    "torch_kernel_init", "query_and_group", "group_knn_features",
    "AttentionPool", "GlobalAttention", "SAModule", "FPModule",
    "KnnFPModule", "FeatureMapModule", "PNet2Stage",
]
