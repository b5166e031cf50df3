"""Pallas kernel parity tests (interpret mode on CPU).

Mirrors the reference's op-level numerical testing strategy (reference:
tests/ops/test_harness.py — run the op, compare against a numpy/torch
oracle); here the oracle is the pure-XLA implementation of the same op.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu.ffconst import ActiMode, AggrMode
from dlrm_flexflow_tpu.ops.embedding import embedding_bag
from dlrm_flexflow_tpu.ops.interaction import dot_interaction
from dlrm_flexflow_tpu.ops.pallas.dot_interaction import dot_interaction_pallas
from dlrm_flexflow_tpu.ops.pallas.embedding_bag import embedding_bag_pallas
from dlrm_flexflow_tpu.ops.pallas.fused_mlp import dense_pallas
from dlrm_flexflow_tpu.ops.common import apply_activation


@pytest.mark.parametrize("self_interaction", [False, True])
def test_dot_interaction_matches_xla(self_interaction):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 9, 16).astype(np.float32))
    ref = dot_interaction(x, self_interaction)
    got = dot_interaction_pallas(x, self_interaction, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_dot_interaction_grad_matches_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 5, 8).astype(np.float32))

    def f_ref(x):
        return jnp.sum(jnp.sin(dot_interaction(x, False)))

    def f_pal(x):
        return jnp.sum(jnp.sin(dot_interaction_pallas(x, False, 16, True)))

    g_ref = jax.grad(f_ref)(x)
    g_pal = jax.grad(f_pal)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("aggr", [AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG])
def test_embedding_bag_matches_xla(aggr):
    rng = np.random.RandomState(2)
    table = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    idx = rng.randint(0, 64, size=(21, 4)).astype(np.int32)
    idx[3, 1:] = -1  # padding
    idx[7, :] = -1  # fully padded bag
    idx = jnp.asarray(idx)
    ref = embedding_bag(table, idx, aggr)
    got = embedding_bag_pallas(table, idx, aggr, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_embedding_bag_grad_matches_xla():
    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 32, size=(12, 3)).astype(np.int32))

    def f_ref(t):
        return jnp.sum(embedding_bag(t, idx, AggrMode.AGGR_MODE_SUM) ** 2)

    def f_pal(t):
        return jnp.sum(
            embedding_bag_pallas(t, idx, AggrMode.AGGR_MODE_SUM, 8, True) ** 2
        )

    g_ref = jax.grad(f_ref)(table)
    g_pal = jax.grad(f_pal)(table)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "m,k,n,act,bias",
    [
        (32, 48, 24, ActiMode.AC_MODE_RELU, True),
        (16, 128, 128, ActiMode.AC_MODE_NONE, False),
        (64, 64, 200, ActiMode.AC_MODE_SIGMOID, True),
    ],
)
def test_dense_pallas_matches_xla(m, k, n, act, bias):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(n).astype(np.float32)) if bias else None
    ref = x @ w
    if bias:
        ref = ref + b
    ref = apply_activation(ref, act)
    got = dense_pallas(x, w, b, act, 16, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("aggr", [AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG])
def test_onehot_embedding_matches_xla(aggr):
    from dlrm_flexflow_tpu.ops.pallas.onehot_embedding import onehot_embedding_pallas

    rng = np.random.RandomState(7)
    table = jnp.asarray(rng.randn(40, 16).astype(np.float32))
    idx = rng.randint(0, 40, size=(19, 3)).astype(np.int32)
    idx[2, 1:] = -1
    idx[5, 1] = idx[5, 0]  # duplicate within bag
    idx = jnp.asarray(idx)
    ref = embedding_bag(table, idx, aggr)
    got = onehot_embedding_pallas(table, idx, aggr, 8, True, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_onehot_embedding_grad_matches_xla():
    from dlrm_flexflow_tpu.ops.pallas.onehot_embedding import onehot_embedding_pallas

    rng = np.random.RandomState(8)
    table = jnp.asarray(rng.randn(24, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 24, size=(13, 2)).astype(np.int32))

    def f_ref(t):
        return jnp.sum(embedding_bag(t, idx, AggrMode.AGGR_MODE_SUM) ** 2)

    def f_pal(t):
        return jnp.sum(
            onehot_embedding_pallas(t, idx, AggrMode.AGGR_MODE_SUM, 8, True, jnp.float32) ** 2
        )

    g_ref = jax.grad(f_ref)(table)
    g_pal = jax.grad(f_pal)(table)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
