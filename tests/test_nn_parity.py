"""Numerical parity of flax building blocks against the REFERENCE torch
implementations with identical weights (the strongest form of the reference's
kernel-vs-python golden test pattern)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from torch_ref import (load_reference_modules, copy_injection_mlp,
                       copy_attention, copy_shared_mlp, _set, _conv_kernel)
from slide_tpu.nn import InjectionMLP, AttentionPool, PNet2Stage, TailGroupNorm

REF_MODULES, REF_ATTENTION = load_reference_modules()


def to_torch_grouped(x):
    # (B, M, K, C) -> (B, C, M, K)
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def from_torch_grouped(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_tail_group_norm_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 4, 35)).astype(np.float32)
    ref = REF_MODULES.MyGroupNorm(32, 35)
    with torch.no_grad():
        ref.group_norm.weight.uniform_(0.5, 1.5)
        ref.group_norm.bias.uniform_(-0.5, 0.5)
    want = from_torch_grouped(ref(to_torch_grouped(x)))

    mod = TailGroupNorm(32, 35)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    params["group_norm"]["scale"] = ref.group_norm.weight.detach().numpy()
    params["group_norm"]["bias"] = ref.group_norm.bias.detach().numpy()
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("bn_first,bias,activation", [
    (False, False, "relu"),
    (True, True, "swish"),
])
def test_injection_mlp_parity(bn_first, bias, activation):
    rng = np.random.default_rng(1)
    spec = [13, 32, 32, 64]
    t_dim = 24
    cond_dim = 16
    cond2_dim = 20
    ref = REF_MODULES.Mlp_plus_t_emb(
        list(spec), bn=True, t_dim=t_dim, include_t=True, bn_first=bn_first,
        bias=bias, first_conv=False, res_connect=True,
        include_condition=True, condition_dim=cond_dim,
        include_second_condition=True, second_condition_dim=cond2_dim,
        activation=activation)
    ref.eval()

    mine = InjectionMLP(spec, bn=True, include_t=True, bn_first=bn_first,
                        bias=bias, res_connect=True, include_condition=True,
                        include_second_condition=True, activation=activation)
    x = rng.normal(size=(2, 6, 4, 13)).astype(np.float32)
    t = rng.normal(size=(2, t_dim)).astype(np.float32)
    c = rng.normal(size=(2, cond_dim)).astype(np.float32)
    c2 = rng.normal(size=(2, cond2_dim)).astype(np.float32)

    variables = mine.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(c), jnp.asarray(c2))
    params = jax.tree.map(np.array, variables["params"])
    copy_injection_mlp(ref, params)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(c), jnp.asarray(c2)))
    with torch.no_grad():
        want = from_torch_grouped(ref(to_torch_grouped(x), torch.from_numpy(t),
                                      torch.from_numpy(c), torch.from_numpy(c2)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_injection_mlp_first_conv_parity():
    rng = np.random.default_rng(2)
    spec = [16, 32, 64]
    ref = REF_MODULES.Mlp_plus_t_emb(
        list(spec), bn=True, include_t=False, bn_first=True, bias=True,
        first_conv=True, first_conv_in_channel=9, res_connect=True,
        include_condition=False)
    ref.eval()
    mine = InjectionMLP(spec, bn=True, include_t=False, bn_first=True, bias=True,
                        first_conv=True, first_conv_in_channel=9, res_connect=True)
    x = rng.normal(size=(2, 5, 3, 9)).astype(np.float32)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(np.array, variables["params"])
    copy_injection_mlp(ref, params)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = from_torch_grouped(ref(to_torch_grouped(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("attention_bn,transform,last_act,counted", [
    (True, True, True, True),
    (False, False, False, False),
])
def test_attention_pool_parity(attention_bn, transform, last_act, counted):
    rng = np.random.default_rng(3)
    B, M, K = 2, 7, 5
    c_in1, c_in2, c_out = 35, 41, 48
    ref = REF_ATTENTION.AttentionModule(
        c_in1, c_in2, c_in1, c_in2, c_out, attention_bn=attention_bn,
        transform_grouped_feat_out=transform, last_activation=last_act)
    ref.eval()
    mine = AttentionPool(c_in1=max(c_in1, 32), c_in2=max(c_in2, 32), c_out=c_out,
                         attention_bn=attention_bn,
                         transform_grouped_feat_out=transform,
                         last_activation=last_act)
    feat = rng.normal(size=(B, M, c_in1)).astype(np.float32)
    grouped = rng.normal(size=(B, M, K, c_in2)).astype(np.float32)
    value = rng.normal(size=(B, M, K, c_out)).astype(np.float32)
    count = rng.integers(0, K + 1, size=(B, M)).astype(np.int32) if counted else "all"

    cj = jnp.asarray(count) if counted else "all"
    variables = mine.init(jax.random.key(0), jnp.asarray(feat), jnp.asarray(grouped),
                          jnp.asarray(value), cj)
    params = jax.tree.map(np.array, variables["params"])
    copy_attention(ref, params, attention_bn, transform, last_act)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(feat),
                                jnp.asarray(grouped), jnp.asarray(value), cj))
    with torch.no_grad():
        tcount = torch.from_numpy(count.astype(np.float32)) if counted else "all"
        want = ref(torch.from_numpy(feat).transpose(1, 2),
                   to_torch_grouped(grouped), to_torch_grouped(value),
                   tcount).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_pnet_parity():
    import models.pnet as ref_pnet
    rng = np.random.default_rng(4)
    mlp1 = [6, 32, 64]
    mlp2 = [96, 128]
    ref = ref_pnet.Pnet2Stage(list(mlp1), list(mlp2), bn=True,
                              remove_last_activation=True)
    ref.eval()
    mine = PNet2Stage(tuple(mlp1), tuple(mlp2), bn=True, remove_last_activation=True)
    x = rng.normal(size=(2, 20, 6)).astype(np.float32)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(np.array, variables["params"])
    copy_shared_mlp(ref.mlp1.first_mlp, params["mlp1"], 1)
    # second stage of each Mlp_plus_t_emb is its (truncated) second_mlp
    _set(params["mlp1"], ["conv_2", "kernel"],
         _conv_kernel(ref.mlp1.second_mlp[0]))
    _set(params["mlp1"], ["conv_2", "bias"],
         ref.mlp1.second_mlp[0].bias.detach().numpy())
    copy_shared_mlp(ref.mlp2.first_mlp, params["mlp2"], 1)
    _set(params["mlp2"], ["conv_2", "kernel"],
         _conv_kernel(ref.mlp2.second_mlp[0]))
    _set(params["mlp2"], ["conv_2", "bias"],
         ref.mlp2.second_mlp[0].bias.detach().numpy())
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x).transpose(1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)
