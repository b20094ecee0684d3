"""Pallas ELL-SpMM kernel tests (interpret mode on CPU).

Oracle: plain gather + segment_sum over the same ELL arrays, plus an
independent check against the model's edge-list aggregation on a real
packed batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.data import packing
from ggnn_tpu.data.ell import (build_ell_layout, padded_node_count,
                               plan_ell_k)
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.ops.pallas import (ell_aggregate_by_type,
                                 ell_aggregate_by_type_reference,
                                 ell_scatter_sum,
                                 ell_scatter_sum_reference)

BN = 8  # small block for tests


def _random_problem(seed, n_nodes=40, t_dim=3, n_edges=90, h_dim=16):
    rng = np.random.RandomState(seed)
    np_total = padded_node_count(n_nodes, BN)
    src = rng.randint(0, n_nodes, size=(t_dim, n_edges)).astype(np.int32)
    tgt = rng.randint(0, n_nodes, size=(t_dim, n_edges)).astype(np.int32)
    mask = (rng.rand(t_dim, n_edges) < 0.8).astype(np.float32)
    h = rng.randn(np_total, h_dim).astype(np.float32)
    layout = build_ell_layout(src, tgt, mask, n_nodes, BN)
    return h, layout, np_total


@pytest.mark.parametrize("seed", [0, 1])
def test_ell_aggregate_matches_reference(seed):
    h, layout, np_total = _random_problem(seed)
    fwd = (jnp.asarray(layout.fwd_src), jnp.asarray(layout.fwd_tgt))
    bwd = (jnp.asarray(layout.bwd_tgt), jnp.asarray(layout.bwd_src))
    out = ell_aggregate_by_type(jnp.asarray(h), fwd, bwd, BN, True)
    ref = ell_aggregate_by_type_reference(jnp.asarray(h), fwd, np_total)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ell_layout_covers_every_edge_once():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 30, size=(2, 50)).astype(np.int32)
    tgt = rng.randint(0, 30, size=(2, 50)).astype(np.int32)
    mask = np.ones((2, 50), np.float32)
    layout = build_ell_layout(src, tgt, mask, 30, BN)
    np_total = padded_node_count(30, BN)
    for t in range(2):
        real = layout.fwd_tgt[t].ravel() < np_total
        pairs = set(zip(layout.fwd_src[t].ravel()[real],
                        layout.fwd_tgt[t].ravel()[real]))
        expected = sorted(zip(src[t], tgt[t]))
        assert sorted(pairs) == sorted(set(expected)) or \
            len(layout.fwd_tgt[t].ravel()[real]) == 50  # multi-edges kept
        assert int(real.sum()) == 50


def test_ell_vjp_matches_autodiff_of_reference():
    h, layout, np_total = _random_problem(7, n_nodes=24, t_dim=2,
                                          n_edges=40, h_dim=8)
    fwd = (jnp.asarray(layout.fwd_src), jnp.asarray(layout.fwd_tgt))
    bwd = (jnp.asarray(layout.bwd_tgt), jnp.asarray(layout.bwd_src))
    w = jnp.asarray(np.random.RandomState(0).randn(
        2, 8, 8).astype(np.float32))

    def loss_kernel(h):
        out = ell_aggregate_by_type(h, fwd, bwd, BN, True)
        return jnp.sum(jnp.tanh(jnp.einsum("tnh,thd->nd", out, w)))

    def loss_ref(h):
        out = ell_aggregate_by_type_reference(h, fwd, np_total)
        return jnp.sum(jnp.tanh(jnp.einsum("tnh,thd->nd", out, w)))

    g_kernel = jax.grad(loss_kernel)(jnp.asarray(h))
    g_ref = jax.grad(loss_ref)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_ell_on_real_packed_batch_matches_edge_list_path():
    data = synthetic_molecules(60, seed=5)
    meta = infer_metadata([data], True)
    proc = packing.preprocess_sparse(data, meta.num_edge_types, True, [0],
                                     {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 300)
    b = next(packing.pack_sparse_batches(proc, meta.num_edge_types, 300,
                                         caps, 16, meta.annotation_size,
                                         False, None))
    n_cap = b.node_capacity
    ell_k = plan_ell_k(b.edge_targets, b.edge_mask, BN,
                   edge_sources=b.edge_sources)
    layout = build_ell_layout(b.edge_sources, b.edge_targets, b.edge_mask,
                              n_cap, BN, ell_k)
    np_total = padded_node_count(n_cap, BN)
    h = np.random.RandomState(1).randn(np_total, 16).astype(np.float32)
    fwd = (jnp.asarray(layout.fwd_src), jnp.asarray(layout.fwd_tgt))
    bwd = (jnp.asarray(layout.bwd_tgt), jnp.asarray(layout.bwd_src))
    out = ell_aggregate_by_type(jnp.asarray(h), fwd, bwd, BN, True)

    # Independent oracle straight from the batch's padded edge lists.
    gathered = jnp.asarray(h)[:n_cap][b.edge_sources]
    per_type = jax.vmap(
        lambda d, s: jax.ops.segment_sum(d, s, num_segments=n_cap + 1)
    )(gathered * jnp.asarray(b.edge_mask)[..., None], b.edge_targets)
    np.testing.assert_allclose(np.asarray(out)[:, :n_cap],
                               np.asarray(per_type)[:, :n_cap],
                               rtol=1e-5, atol=1e-5)


def test_ell_scatter_sum_matches_reference():
    h, layout, np_total = _random_problem(11, n_nodes=32, t_dim=2,
                                          n_edges=60, h_dim=8)
    g = jnp.asarray(np.random.RandomState(2).randn(
        2, np_total, 8).astype(np.float32))
    gat = jnp.asarray(layout.bwd_tgt)
    oh = jnp.asarray(layout.bwd_src)
    out = ell_scatter_sum(g, gat, oh, BN, True)
    ref = ell_scatter_sum_reference(g, gat, oh, np_total)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sparse_model_ell_path_matches_xla_path():
    """Full-model check: SparseGGNN with ell_block (interpret kernels)
    must produce the same node states as the XLA edge-list path."""
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.training.config import SPARSE_DEFAULTS

    data = synthetic_molecules(40, seed=9)
    meta = infer_metadata([data], True)
    proc = packing.preprocess_sparse(data, meta.num_edge_types, True, [0],
                                     {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 250)
    ke = 8
    for b in packing.pack_sparse_batches(proc, meta.num_edge_types, 250,
                                         caps, 16, meta.annotation_size,
                                         False, None):
        ke = max(ke, plan_ell_k(b.edge_targets, b.edge_mask, BN,
                                edge_sources=b.edge_sources))
    cfg = {**SPARSE_DEFAULTS, "hidden_size": 16, "layer_timesteps": [2, 1],
           "residual_connections": {}, "use_edge_bias": True,
           "edge_weight_dropout_keep_prob": 1.0}
    m_xla = SparseGGNN(cfg, meta.num_edge_types)
    m_ell = SparseGGNN({**cfg, "ell_block": BN, "ell_pallas": True,
                        "ell_interpret": True}, meta.num_edge_types)
    params = m_xla.init_params(jax.random.PRNGKey(0))

    for b_ell in packing.pack_sparse_batches(
            proc, meta.num_edge_types, 250, caps, 16, meta.annotation_size,
            False, None, ell_block=BN, ell_k=ke):
        out_ell = np.asarray(m_ell.forward(params, b_ell))
        out_xla = np.asarray(m_xla.forward(params, b_ell))
        np.testing.assert_allclose(out_ell, out_xla, rtol=1e-5, atol=1e-5)

        # gradients agree too (exercises the transpose kernel)
        def loss(p, model, bb):
            return jnp.sum(model.forward(p, bb) ** 2)
        g_ell = jax.grad(lambda p: loss(p, m_ell, b_ell))(params)
        g_xla = jax.grad(lambda p: loss(p, m_xla, b_ell))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            g_ell, g_xla)


def test_sorted_vjp_ell_path_matches_xla_path():
    """The default ELL path (sorted scatters in BOTH directions via
    custom VJP over the ELL backward arrays) must match the plain XLA
    path in values AND gradients."""
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.training.config import SPARSE_DEFAULTS

    data = synthetic_molecules(40, seed=12)
    meta = infer_metadata([data], True)
    proc = packing.preprocess_sparse(data, meta.num_edge_types, True, [0],
                                     {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 250)
    ke = 8
    for b in packing.pack_sparse_batches(proc, meta.num_edge_types, 250,
                                         caps, 16, meta.annotation_size,
                                         False, None):
        ke = max(ke, plan_ell_k(b.edge_targets, b.edge_mask, BN,
                                edge_sources=b.edge_sources))
    cfg = {**SPARSE_DEFAULTS, "hidden_size": 16, "layer_timesteps": [2, 1],
           "residual_connections": {}, "use_edge_bias": True,
           "edge_weight_dropout_keep_prob": 1.0}
    m_xla = SparseGGNN(cfg, meta.num_edge_types)
    m_sorted = SparseGGNN({**cfg, "ell_block": BN, "ell_sorted_vjp": True},
                          meta.num_edge_types)
    params = m_xla.init_params(jax.random.PRNGKey(1))

    for b_ell in packing.pack_sparse_batches(
            proc, meta.num_edge_types, 250, caps, 16, meta.annotation_size,
            False, None, ell_block=BN, ell_k=ke):
        out_s = np.asarray(m_sorted.forward(params, b_ell))
        out_x = np.asarray(m_xla.forward(params, b_ell))
        np.testing.assert_allclose(out_s, out_x, rtol=1e-5, atol=1e-5)

        def loss(p, model, bb):
            return jnp.sum(model.forward(p, bb) ** 2)
        g_s = jax.grad(lambda p: loss(p, m_sorted, b_ell))(params)
        g_x = jax.grad(lambda p: loss(p, m_xla, b_ell))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            g_s, g_x)
