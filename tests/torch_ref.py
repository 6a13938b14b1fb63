"""Test-only harness to load the REFERENCE torch modules (read-only, for
numerical cross-validation — mirroring the reference's own CUDA-vs-python
`unit_test.py` pattern) and copy their weights into our flax modules.

The reference's `pointnet2_utils` imports its CUDA extension and pytorch3d at
module import time; neither exists here, so we install inert stubs — the
pure-torch building blocks under test never call them.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REF_OPS_LIB = "/root/reference/pointnet2_ops_lib"
_REF_PNET2 = "/root/reference/pointnet2"
_REF_ROOT = "/root/reference"


def load_reference_modules():
    """Import and return the reference `pointnet2_ops.pointnet2_modules` and
    `pointnet2_ops.attention` torch modules (CPU)."""
    for p in (_REF_OPS_LIB, _REF_PNET2, _REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    # stub the CUDA extension
    if "pointnet2_ops._ext" not in sys.modules:
        sys.modules["pointnet2_ops._ext"] = types.ModuleType("pointnet2_ops._ext")
    # stub pytorch3d.ops.knn
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        p3d_ops = types.ModuleType("pytorch3d.ops")
        p3d_knn = types.ModuleType("pytorch3d.ops.knn")
        p3d_knn.knn_points = None
        p3d_knn.knn_gather = None
        p3d_ops.knn = p3d_knn
        p3d.ops = p3d_ops
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.ops"] = p3d_ops
        sys.modules["pytorch3d.ops.knn"] = p3d_knn
    import pointnet2_ops.pointnet2_modules as ref_modules
    import pointnet2_ops.attention as ref_attention
    return ref_modules, ref_attention


# ---------------------------------------------------------------------------
# torch -> flax weight copying


def _conv_kernel(conv):
    w = conv.weight.detach().numpy()
    if w.ndim == 4:        # Conv2d (out, in, 1, 1)
        w = w[:, :, 0, 0]
    return np.ascontiguousarray(w.T)          # (in, out)


def _set(params: dict, path: list[str], value):
    node = params
    for p in path[:-1]:
        node = node[p]
    assert node[path[-1]].shape == value.shape, (
        f"{'/'.join(path)}: {node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value


def copy_shared_mlp(torch_seq, params: dict, n_layers: int):
    """Copy a torch build_shared_mlp Sequential into our SharedMLP params
    (conv_i / norm_i, i = 1..n_layers), pairing Convs and GroupNorms in
    order."""
    import torch.nn as tnn
    convs = [m for m in torch_seq if isinstance(m, tnn.Conv2d)]
    gns = [m for m in torch_seq if hasattr(m, "group_norm")]
    assert len(convs) == n_layers, (len(convs), n_layers)
    for i, conv in enumerate(convs, start=1):
        _set(params, [f"conv_{i}", "kernel"], _conv_kernel(conv))
        if conv.bias is not None:
            _set(params, [f"conv_{i}", "bias"], conv.bias.detach().numpy())
    for i, gn in enumerate(gns, start=1):
        _set(params, [f"norm_{i}", "group_norm", "scale"],
             gn.group_norm.weight.detach().numpy())
        _set(params, [f"norm_{i}", "group_norm", "bias"],
             gn.group_norm.bias.detach().numpy())


def copy_injection_mlp(torch_mlp, params: dict):
    """Copy a torch Mlp_plus_t_emb into our InjectionMLP params dict."""
    copy_shared_mlp(torch_mlp.first_mlp, params["first_mlp"], 1)
    copy_shared_mlp(torch_mlp.second_mlp, params["second_mlp"], 1)
    if torch_mlp.rest_mlp is not None:
        n = len([m for m in torch_mlp.rest_mlp if hasattr(m, "weight") or True])
        import torch.nn as tnn
        n = len([m for m in torch_mlp.rest_mlp if isinstance(m, tnn.Conv2d)])
        copy_shared_mlp(torch_mlp.rest_mlp, params["rest_mlp"], n)
    if torch_mlp.include_t:
        _set(params, ["fc_t", "kernel"], _conv_kernel(torch_mlp.fc))
        _set(params, ["fc_t", "bias"], torch_mlp.fc.bias.detach().numpy())
    if torch_mlp.include_condition:
        _set(params, ["fc_condition", "kernel"], _conv_kernel(torch_mlp.fc_condition))
        _set(params, ["fc_condition", "bias"],
             torch_mlp.fc_condition.bias.detach().numpy())
    if torch_mlp.include_second_condition:
        _set(params, ["fc_second_condition", "kernel"],
             _conv_kernel(torch_mlp.fc_second_condition))
        _set(params, ["fc_second_condition", "bias"],
             torch_mlp.fc_second_condition.bias.detach().numpy())
    if torch_mlp.res_connect_bool and torch_mlp.res_connect is not None:
        _set(params, ["res_conv", "kernel"], _conv_kernel(torch_mlp.res_connect))
        if torch_mlp.res_connect.bias is not None:
            _set(params, ["res_conv", "bias"], torch_mlp.res_connect.bias.detach().numpy())
    if torch_mlp.first_conv_bool:
        _set(params, ["first_conv", "kernel"], _conv_kernel(torch_mlp.first_conv))
        if torch_mlp.first_conv.bias is not None:
            _set(params, ["first_conv", "bias"], torch_mlp.first_conv.bias.detach().numpy())


def copy_attention(torch_att, params: dict, attention_bn: bool,
                   transform_grouped_feat_out: bool, last_activation: bool):
    """Copy a torch AttentionModule into our AttentionPool params dict."""
    import torch.nn as tnn
    _set(params, ["feat_conv", "kernel"], _conv_kernel(torch_att.feat_conv))
    _set(params, ["feat_conv", "bias"], torch_att.feat_conv.bias.detach().numpy())
    _set(params, ["grouped_feat_conv", "kernel"],
         _conv_kernel(torch_att.grouped_feat_conv))
    _set(params, ["grouped_feat_conv", "bias"],
         torch_att.grouped_feat_conv.bias.detach().numpy())
    convs = [m for m in torch_att.weight_conv if isinstance(m, tnn.Conv2d)]
    gns = [m for m in torch_att.weight_conv if hasattr(m, "group_norm")]
    for i, conv in enumerate(convs, start=1):
        _set(params, [f"w_conv_{i}", "kernel"], _conv_kernel(conv))
        _set(params, [f"w_conv_{i}", "bias"], conv.bias.detach().numpy())
    for i, gn in enumerate(gns, start=1):
        _set(params, [f"w_norm_{i}", "group_norm", "scale"],
             gn.group_norm.weight.detach().numpy())
        _set(params, [f"w_norm_{i}", "group_norm", "bias"],
             gn.group_norm.bias.detach().numpy())
    if transform_grouped_feat_out:
        fconvs = [m for m in torch_att.feat_out_conv if isinstance(m, tnn.Conv2d)]
        _set(params, ["feat_out_conv", "kernel"], _conv_kernel(fconvs[0]))
        _set(params, ["feat_out_conv", "bias"], fconvs[0].bias.detach().numpy())
        fgns = [m for m in torch_att.feat_out_conv if hasattr(m, "group_norm")]
        if fgns:
            _set(params, ["feat_out_norm", "group_norm", "scale"],
                 fgns[0].group_norm.weight.detach().numpy())
            _set(params, ["feat_out_norm", "group_norm", "bias"],
                 fgns[0].group_norm.bias.detach().numpy())
