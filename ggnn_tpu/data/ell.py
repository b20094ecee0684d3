"""Host-side blocked-ELL edge layouts for the Pallas SpMM kernels.

For each edge type, edges are grouped by the node *block* (BN rows) of
their key node — target for the forward aggregation, source for the
transpose — and packed into fixed KE slots per (type, block). Padded
slots carry gather index 0 (any valid row; contribution is zeroed) and
one-hot index NP (out of every block's range, so the on-chip one-hot
row is all zeros). See ops/pallas/ell_spmm.py.
"""

import dataclasses
import logging

import jax
import numpy as np

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLLayout:
    """fwd_*: target-block-major (forward aggregation);
    bwd_*: source-block-major (gradient transpose). All [T, NB, KE]."""

    fwd_src: jax.Array   # gather indices (edge sources), pad -> 0
    fwd_tgt: jax.Array   # one-hot indices (absolute targets), pad -> NP
    bwd_tgt: jax.Array   # gather indices (edge targets), pad -> 0
    bwd_src: jax.Array   # one-hot indices (absolute sources), pad -> NP

    @property
    def ell_k(self) -> int:
        return self.fwd_src.shape[2]


def padded_node_count(node_capacity: int, block_nodes: int) -> int:
    return -(-node_capacity // block_nodes) * block_nodes


def plan_ell_k(edge_targets, edge_mask, block_nodes: int,
               edge_sources=None) -> int:
    """Max edges per (type, node-block), rounded up to 8.

    The layout packs edges TWICE — target-block-major forward arrays
    and source-block-major backward arrays — so when `edge_sources` is
    given the plan covers BOTH key distributions (a target-only plan
    could overflow the backward pack of the very batch it measured)."""
    ke = 1
    for keys in ([edge_targets] if edge_sources is None
                 else [edge_targets, edge_sources]):
        for t in range(keys.shape[0]):
            real = keys[t][edge_mask[t] > 0]
            if len(real):
                counts = np.bincount(real // block_nodes)
                ke = max(ke, int(counts.max()))
    return -(-ke // 8) * 8


class ELLOverflowError(ValueError):
    """A batch's per-(type, node-block) edge count exceeds the planned
    ell_k — the ONLY condition try_build_ell_layout may swallow."""


def _pack_one(key_idx, other_idx, nb_count, ell_k, np_total):
    """(key, other) edge lists -> block-major [NB, KE] arrays."""
    onehot = np.full((nb_count, ell_k), np_total, dtype=np.int32)
    gather = np.zeros((nb_count, ell_k), dtype=np.int32)
    if len(key_idx) == 0:
        return gather, onehot
    order = np.argsort(key_idx, kind="stable")
    key_idx, other_idx = key_idx[order], other_idx[order]
    blocks = key_idx // (np_total // nb_count)
    # slot within block = rank among equal-block entries (blocks sorted)
    first = np.searchsorted(blocks, blocks, side="left")
    slots = np.arange(len(blocks)) - first
    if slots.max() >= ell_k:
        raise ELLOverflowError(
            f"ELL overflow: block needs {slots.max() + 1} slots > "
            f"ell_k={ell_k}")
    onehot[blocks, slots] = key_idx
    gather[blocks, slots] = other_idx
    return gather, onehot


def build_ell_layout(edge_sources, edge_targets, edge_mask,
                     node_capacity: int, block_nodes: int,
                     ell_k=None) -> ELLLayout:
    """Blocked-ELL layouts for one packed batch (numpy, host side).

    `ell_k` can be passed from a corpus-wide plan so every batch shares
    one kernel compilation; it must be >= this batch's per-block max.
    """
    edge_sources = np.asarray(edge_sources)
    edge_targets = np.asarray(edge_targets)
    edge_mask = np.asarray(edge_mask)
    np_total = padded_node_count(node_capacity, block_nodes)
    nb_count = np_total // block_nodes
    if ell_k is None:
        ell_k = plan_ell_k(edge_targets, edge_mask, block_nodes,
                           edge_sources=edge_sources)
    t_dim = edge_sources.shape[0]
    fwd_src = np.zeros((t_dim, nb_count, ell_k), dtype=np.int32)
    fwd_tgt = np.full((t_dim, nb_count, ell_k), np_total, dtype=np.int32)
    bwd_tgt = np.zeros((t_dim, nb_count, ell_k), dtype=np.int32)
    bwd_src = np.full((t_dim, nb_count, ell_k), np_total, dtype=np.int32)
    for t in range(t_dim):
        real = edge_mask[t] > 0
        src, tgt = edge_sources[t][real], edge_targets[t][real]
        fwd_src[t], fwd_tgt[t] = _pack_one(tgt, src, nb_count, ell_k,
                                           np_total)
        bwd_tgt[t], bwd_src[t] = _pack_one(src, tgt, nb_count, ell_k,
                                           np_total)
    return ELLLayout(fwd_src=fwd_src, fwd_tgt=fwd_tgt,
                     bwd_tgt=bwd_tgt, bwd_src=bwd_src)


def try_build_ell_layout(edge_sources, edge_targets, edge_mask,
                         node_capacity: int, block_nodes: int, ell_k):
    """build_ell_layout, but an overflowing batch (a shuffle that
    concentrates more edges per block than the planned ell_k) returns
    None instead of raising. NOTE: both packers now convert the None
    into a ValueError with the replan remedy — silently emitting a
    plain GraphBatch mid-stream would change the pytree class on
    jitted/stacked consumers — so this soft interface only isolates
    the overflow signal from other errors (ELLOverflowError alone is
    swallowed; anything else propagates)."""
    try:
        return build_ell_layout(edge_sources, edge_targets, edge_mask,
                                node_capacity, block_nodes, ell_k)
    except ELLOverflowError as e:
        # ONLY the planned-capacity overflow is a legal fallback; any
        # other ValueError (mis-shaped inputs, a future indexing bug)
        # must surface instead of being mislabeled "overflow" and
        # silently swallowed (round-5 review).
        logger.warning(
            "ELL layout overflow (%s); falling back to the XLA path for "
            "this batch", e)
        return None
