"""Blocked-ELL gather + segment-sum as MXU matmuls (Pallas TPU).

Why: the sparse GGNN's propagation step is dominated not by its matmuls
but by `segment_sum`'s scatter-add — measured ~1.8-2.7ms per step at
[T=4, E=40k, H=100] into [20k, 100] on a v5e chip, ~20x off the HBM
floor, and ~50x the cost of every other op in the step combined
(chem_tensorflow_sparse.py:199-201 is the reference's equivalent
`tf.unsorted_segment_sum`).

How: the packer lays each edge type out in *target-block-major ELL
order*: edges whose target lies in node block `nb` (BN rows) occupy slot
range [nb*KE, (nb+1)*KE), padded with out-of-range targets. Then for
each (type, block) the segment-sum is an MXU matmul

    out[nb] = one_hot(tgt - nb*BN) @ gathered          [BN,KE] @ [KE,H]

with the one-hot built on-chip (never hitting HBM) and zero rows for
padding (relative target >= BN). Node states stay resident in VMEM for
the whole kernel; the only per-edge work left is the KE-row VMEM gather.
There is no scatter anywhere.

Shapes/limits: node count NP must be a multiple of BN and node states
must fit VMEM (NP*H*4 bytes <= ~12MB, e.g. 24k nodes at H=128). Gather
indices live in SMEM blocks; targets in VMEM int32 blocks.

Measured on one v5e chip at N=20k, E=160k, H=100 (QM9 packing):
1.50ms per aggregation+transform vs 2.60ms for XLA's UNSORTED scatter
(1.7x), but PARITY with XLA's sorted-scatter path (~1.78 vs ~1.75ms per
step forward, full-model 8-step inference 14.2 vs 14.0ms) — which the
packers' target-sorted layout contract now enables by default. The
remaining floor in both is the per-edge row access (~8ns/row here).
The kernel is therefore ARCHIVED (the `ell_block` config surface was
removed once parity was measured; ops/messages.py:14-17 — f32 only:
Mosaic cannot prove bf16 dynamic row indexing tile-aligned): it
documents the scatter-free MXU formulation and is the starting point
for shapes where it should pull ahead (H >= 128 MXU-aligned rows,
higher degree, VMEM-resident multi-step fusion). For QM9-sized graphs
the block-diagonal dense path (models/dense_ggnn.py) is the fast route.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ fwd

def _agg_kernel(src_ref, tgt_ref, h_ref, out_ref, gath_ref, *, block_nodes,
                ell_k):
    """grid (T, NB): out[t, nb*BN:(nb+1)*BN, :] = onehot @ gathered."""
    nb = pl.program_id(1)

    def gather_body(k, _):
        gath_ref[k, :] = h_ref[src_ref[0, 0, k, 0], :]
        return 0

    jax.lax.fori_loop(0, ell_k, gather_body, 0)

    rel = tgt_ref[0, 0, :, :] - nb * block_nodes                 # [KE, 1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ell_k, block_nodes), 1)
    onehot_t = (col_ids == rel).astype(h_ref.dtype)              # [KE, BN]
    # out[BN, H] = onehot_t^T @ gathered — contract dim 0 with dim 0.
    out_ref[0, :, :] = jax.lax.dot_general(
        onehot_t, gath_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _agg_call(h, ell_src, ell_tgt, *, block_nodes, interpret=False):
    t, nb_count, ell_k = ell_src.shape
    np_, hdim = h.shape
    assert np_ % block_nodes == 0 and nb_count == np_ // block_nodes
    kernel = functools.partial(_agg_kernel, block_nodes=block_nodes,
                               ell_k=ell_k)
    return pl.pallas_call(
        kernel,
        grid=(t, nb_count),
        in_specs=[
            pl.BlockSpec((1, 1, ell_k, 1), lambda ti, ni: (ti, ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ell_k, 1), lambda ti, ni: (ti, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full node states
        ],
        out_specs=pl.BlockSpec((1, block_nodes, hdim),
                               lambda ti, ni: (ti, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, np_, hdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ell_k, hdim), h.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ell_src[..., None], ell_tgt[..., None], h)


# ------------------------------------------------------------------ bwd

def _scatter_kernel(gat_ref, oh_ref, g_ref, out_ref, gath_ref, *,
                    block_nodes, ell_k):
    """grid (T, NB): out[t, nb] = onehot(oh_idx - nb*BN)^T @ g[t][idx].
    g arrives as a per-type (1, NP, H) block (kept VMEM-resident across
    the inner nb sweep); the type sum happens outside the kernel."""
    nb = pl.program_id(1)

    def gather_body(k, _):
        gath_ref[k, :] = g_ref[0, gat_ref[0, 0, k, 0], :]
        return 0

    jax.lax.fori_loop(0, ell_k, gather_body, 0)

    rel = oh_ref[0, 0, :, :] - nb * block_nodes                  # [KE, 1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ell_k, block_nodes), 1)
    onehot_t = (col_ids == rel).astype(g_ref.dtype)              # [KE, BN]
    out_ref[0, :, :] = jax.lax.dot_general(
        onehot_t, gath_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scatter_call(g, gather_idx, onehot_idx, *, block_nodes,
                  interpret=False):
    """out[n] = sum_{t,k: onehot_idx[t,nb,k]==n} g[t, gather_idx[t,nb,k]]."""
    t, nb_count, ell_k = gather_idx.shape
    tg, np_, hdim = g.shape
    assert tg == t and np_ % block_nodes == 0
    kernel = functools.partial(_scatter_kernel, block_nodes=block_nodes,
                               ell_k=ell_k)
    per_type = pl.pallas_call(
        kernel,
        grid=(t, nb_count),
        in_specs=[
            pl.BlockSpec((1, 1, ell_k, 1), lambda ti, ni: (ti, ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ell_k, 1), lambda ti, ni: (ti, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            # one type's cotangent slab, resident across the nb sweep
            pl.BlockSpec((1, np_, hdim), lambda ti, ni: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_nodes, hdim),
                               lambda ti, ni: (ti, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, np_, hdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ell_k, hdim), g.dtype)],
        # The per-type g slab (NP*H*4B) is double-buffered by the
        # pipeline; the default 16MB scoped-vmem cap trips at NP~20k.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gather_idx[..., None], onehot_idx[..., None], g)
    return jnp.sum(per_type, axis=0)


# ------------------------------------------------- public ops (+ vjp)

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ell_aggregate_by_type(h, fwd_layout, bwd_layout, block_nodes=256,
                          interpret=False):
    """Per-type aggregation of source states: out[t, n] = sum over edges
    of type t with target n of h[source]. `fwd_layout` = (src, tgt) in
    target-block-major ELL order; `bwd_layout` = (tgt, src) in
    source-block-major order (for the transpose). Returns [T, NP, H] f32.
    """
    src, tgt = fwd_layout
    return _agg_call(h, src, tgt, block_nodes=block_nodes,
                     interpret=interpret)


def _ell_agg_fwd(h, fwd_layout, bwd_layout, block_nodes, interpret):
    out = _agg_call(h, fwd_layout[0], fwd_layout[1],
                    block_nodes=block_nodes, interpret=interpret)
    return out, (bwd_layout, jnp.zeros((0,), h.dtype))


def _ell_agg_bwd(block_nodes, interpret, res, g):
    (bwd_gather, bwd_onehot), dtype_witness = res
    # dL/dh[n] = sum_{t, e: src_e = n} g[t, tgt_e]: gather g rows by
    # target, one-hot-scatter by source — the same kernel, transposed.
    dh = _scatter_call(g.astype(dtype_witness.dtype), bwd_gather,
                       bwd_onehot, block_nodes=block_nodes,
                       interpret=interpret)
    return dh.astype(dtype_witness.dtype), None, None


ell_aggregate_by_type.defvjp(_ell_agg_fwd, _ell_agg_bwd)


def ell_scatter_sum(g, gather_idx, onehot_idx, block_nodes=256,
                    interpret=False):
    """Standalone transpose op (used by tests)."""
    return _scatter_call(g, gather_idx, onehot_idx,
                         block_nodes=block_nodes, interpret=interpret)


# ------------------------------------------------- jnp references

def ell_aggregate_by_type_reference(h, fwd_layout, np_total):
    """Pure-jnp oracle: segment-sum of gathered rows, ELL flattened."""
    src, tgt = fwd_layout
    t, nb, ke = src.shape
    gathered = h[src.reshape(t, nb * ke)]              # [T, NB*KE, H]
    # padded lanes carry tgt == NP (out of range) -> dump row NP
    out = jax.vmap(
        lambda d, s: jax.ops.segment_sum(
            d, s, num_segments=np_total + 1)
    )(gathered, tgt.reshape(t, nb * ke))
    return out[:, :np_total].astype(jnp.float32)


def ell_scatter_sum_reference(g, gather_idx, onehot_idx, np_total):
    t, nb, ke = gather_idx.shape
    rows = jax.vmap(lambda gt, idx: gt[idx])(
        g, gather_idx.reshape(t, nb * ke))             # [T, NB*KE, H]
    flat_rows = rows.reshape(t * nb * ke, -1)
    flat_idx = onehot_idx.reshape(t * nb * ke)
    out = jax.ops.segment_sum(flat_rows, flat_idx,
                              num_segments=np_total + 1)
    return out[:np_total].astype(jnp.float32)
