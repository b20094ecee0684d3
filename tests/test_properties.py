"""Property-based packing invariants (hypothesis).

For arbitrary valid graph corpora, every packer must conserve the edge
multiset (with node-id offsets), cover every graph exactly once, honor
the target-sorted layout contract, and keep in-degrees consistent with
the packed edge lists.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from ggnn_tpu.data import native_pack, packing
from ggnn_tpu.data.loader import infer_metadata


@st.composite
def corpora(draw):
    n_graphs = draw(st.integers(1, 8))
    graphs = []
    for _ in range(n_graphs):
        n = draw(st.integers(2, 12))
        n_edges = draw(st.integers(1, 20))
        edges = [
            [draw(st.integers(0, n - 1)), draw(st.integers(1, 3)),
             draw(st.integers(0, n - 1))]
            for _ in range(n_edges)
        ]
        feats = [[1, 0] for _ in range(n)]
        graphs.append({"targets": [[draw(st.floats(-2, 2))]],
                       "graph": edges, "node_features": feats})
    return graphs


@settings(max_examples=30, deadline=None)
@given(corpora())
def test_sparse_pack_conserves_edges_and_layout(raw):
    meta = infer_metadata([raw], True)
    proc = native_pack.preprocess_sparse_native(
        raw, meta.num_edge_types, True, [0], {}, False)
    caps = native_pack.plan_capacities_native(proc, 40)
    batches = list(native_pack.pack_sparse_batches_native(
        proc, meta.num_edge_types, True, 40, caps, 8, 2, False, None))

    # every graph appears exactly once
    assert sum(int(b.num_graphs) for b in batches) == len(raw)

    # total real edge count = 2x raw directed edges (tied reversal),
    # minus nothing (duplicates kept)
    total_edges = sum(float(np.asarray(b.edge_mask).sum()) for b in batches)
    assert total_edges == 2 * sum(len(g["graph"]) for g in raw)

    for b in batches:
        em = np.asarray(b.edge_mask)
        tgt = np.asarray(b.edge_targets)
        src = np.asarray(b.edge_sources)
        deg = np.asarray(b.in_degrees)
        for t in range(meta.num_edge_types):
            # layout contract: targets sorted, padding (dump) at the end
            assert np.all(np.diff(tgt[t]) >= 0)
            real = em[t] > 0
            assert np.all(tgt[t][real] < b.node_capacity)
            assert np.all(tgt[t][~real] == b.node_capacity)
            # in-degrees match the packed lists exactly
            counts = np.bincount(tgt[t][real],
                                 minlength=b.node_capacity + 1)
            np.testing.assert_array_equal(counts[:b.node_capacity],
                                          deg[:, t])
            # sources in range
            assert np.all(src[t][real] < int(b.num_nodes))


@settings(max_examples=20, deadline=None)
@given(corpora())
def test_native_equals_python_on_random_corpora(raw):
    meta = infer_metadata([raw], True)
    py_proc = packing.preprocess_sparse(raw, meta.num_edge_types, True,
                                        [0], {}, False)
    caps = packing.plan_capacities(py_proc, meta.num_edge_types, 40)
    py = list(packing.pack_sparse_batches(
        py_proc, meta.num_edge_types, 40, caps, 8, 2, False, None))
    nat_proc = native_pack.preprocess_sparse_native(
        raw, meta.num_edge_types, True, [0], {}, False)
    nat = list(native_pack.pack_sparse_batches_native(
        nat_proc, meta.num_edge_types, True, 40,
        native_pack.plan_capacities_native(nat_proc, 40), 8, 2,
        False, None))
    assert len(py) == len(nat)
    import jax
    for a, b in zip(py, nat):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@settings(max_examples=25, deadline=None)
@given(corpora())
def test_combined_lane_is_exact_relayout(raw):
    """The type-combined lane holds exactly the typed lanes' real edge
    multiset, (target, type)-sorted, for arbitrary corpora."""
    meta = infer_metadata([raw], True)
    proc = packing.preprocess_sparse(raw, meta.num_edge_types, True,
                                     [0], {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 40)
    assert caps.edges_all > 0
    for b in packing.pack_sparse_batches(
            proc, meta.num_edge_types, 40, caps, 8, meta.annotation_size,
            False, None):
        assert b.edge_sources_all is not None
        real = np.asarray(b.edge_mask_all) > 0
        src = np.asarray(b.edge_sources_all)[real]
        tgt = np.asarray(b.edge_targets_all)[real]
        typ = np.asarray(b.edge_types_all)[real]
        typed = []
        m = np.asarray(b.edge_mask) > 0
        for t in range(meta.num_edge_types):
            for s_, d_ in zip(np.asarray(b.edge_sources)[t][m[t]],
                              np.asarray(b.edge_targets)[t][m[t]]):
                typed.append((int(d_), t, int(s_)))
        combined = sorted(zip(tgt.tolist(), typ.tolist(), src.tolist()))
        assert combined == sorted(typed)
        # sortedness of the composite key
        comp = tgt * meta.num_edge_types + typ
        assert np.all(np.diff(comp) >= 0)


@settings(max_examples=15, deadline=None)
@given(corpora(), st.integers(1, 4))
def test_node_shard_is_exact_relayout(raw, n_shards):
    """shard_batch splits every packed batch's real edge multiset
    exactly across the local and boundary lanes: local edges keep their
    (global src, tgt, type), boundary edges resolve through send_idx to
    the same global source row, every lane is composite-sorted, and
    send_idx rows are deduplicated per (owner, dest)."""
    from ggnn_tpu.parallel.node_shard import (plan_node_shard_caps,
                                              shard_batch)
    meta = infer_metadata([raw], True)
    proc = packing.preprocess_sparse(raw, meta.num_edge_types, True,
                                     [0], {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 40)
    t_dim = meta.num_edge_types
    for b in packing.pack_sparse_batches(
            proc, meta.num_edge_types, 40, caps, 8, meta.annotation_size,
            False, None):
        ns_caps = plan_node_shard_caps([b], n_shards)
        sb = shard_batch(b, ns_caps)
        nl, b_cap = ns_caps.nodes_local, ns_caps.boundary
        want = []
        m = np.asarray(b.edge_mask) > 0
        for t in range(t_dim):
            for s_, d_ in zip(np.asarray(b.edge_sources)[t][m[t]],
                              np.asarray(b.edge_targets)[t][m[t]]):
                want.append((int(s_), int(d_), t))
        got = []
        send = np.asarray(sb.send_idx)
        for s in range(n_shards):
            lm = np.asarray(sb.loc_mask)[s] > 0
            for src, ty, tg in zip(np.asarray(sb.loc_src)[s][lm],
                                   np.asarray(sb.loc_type)[s][lm],
                                   np.asarray(sb.loc_tgt)[s][lm]):
                got.append((s * nl + int(src), s * nl + int(tg), int(ty)))
            bm = np.asarray(sb.bnd_mask)[s] > 0
            for src, ty, tg in zip(np.asarray(sb.bnd_src)[s][bm],
                                   np.asarray(sb.bnd_type)[s][bm],
                                   np.asarray(sb.bnd_tgt)[s][bm]):
                owner, slot = int(src) // b_cap, int(src) % b_cap
                assert owner != s  # boundary rows come from peers
                global_src = owner * nl + int(send[owner, s, slot])
                got.append((global_src, s * nl + int(tg), int(ty)))
            # composite sortedness per lane (sorted-scatter contract)
            comp_l = (np.asarray(sb.loc_tgt)[s] * t_dim
                      + np.asarray(sb.loc_type)[s])
            comp_b = (np.asarray(sb.bnd_tgt)[s] * t_dim
                      + np.asarray(sb.bnd_type)[s])
            assert np.all(np.diff(comp_l) >= 0)
            assert np.all(np.diff(comp_b) >= 0)
        assert sorted(got) == sorted(want)


@settings(max_examples=15, deadline=None)
@given(corpora(), st.integers(2, 4))
def test_ragged_node_shard_is_exact_relayout(raw, n_shards):
    """The ragged transport's routing tables resolve every boundary
    edge to the same global source the collective would deliver: each
    receive-table row decodes (through the receiver's owner-major true
    offsets and the sender's dest-major packed buffer) to exactly one
    (owner != self, slot), and the reconstructed edge multiset equals
    the packed batch's — same contract the alltoall/shift layouts pin
    above."""
    from ggnn_tpu.parallel.node_shard import (plan_node_shard_caps,
                                              shard_batch)
    meta = infer_metadata([raw], True)
    proc = packing.preprocess_sparse(raw, meta.num_edge_types, True,
                                     [0], {}, False)
    caps = packing.plan_capacities(proc, meta.num_edge_types, 40)
    t_dim = meta.num_edge_types
    for b in packing.pack_sparse_batches(
            proc, meta.num_edge_types, 40, caps, 8, meta.annotation_size,
            False, None):
        ns_caps = plan_node_shard_caps([b], n_shards)
        sb = shard_batch(b, ns_caps, exchange="ragged")
        spec = sb.send_idx
        nl = ns_caps.nodes_local
        io = np.asarray(spec.input_offsets)   # [owner, dest]
        ss = np.asarray(spec.send_sizes)      # [owner, dest]
        recv_off = np.asarray(spec.output_offsets).T  # [receiver, owner]
        np.testing.assert_array_equal(np.asarray(spec.recv_sizes), ss.T)
        gather = np.asarray(spec.gather)      # [owner, SEND_CAP]
        want = []
        m = np.asarray(b.edge_mask) > 0
        for t in range(t_dim):
            for s_, d_ in zip(np.asarray(b.edge_sources)[t][m[t]],
                              np.asarray(b.edge_targets)[t][m[t]]):
                want.append((int(s_), int(d_), t))
        got = []
        for s in range(n_shards):
            lm = np.asarray(sb.loc_mask)[s] > 0
            for src, ty, tg in zip(np.asarray(sb.loc_src)[s][lm],
                                   np.asarray(sb.loc_type)[s][lm],
                                   np.asarray(sb.loc_tgt)[s][lm]):
                got.append((s * nl + int(src), s * nl + int(tg), int(ty)))
            bm = np.asarray(sb.bnd_mask)[s] > 0
            for row, ty, tg in zip(np.asarray(sb.bnd_src)[s][bm],
                                   np.asarray(sb.bnd_type)[s][bm],
                                   np.asarray(sb.bnd_tgt)[s][bm]):
                row = int(row)
                owners = [o for o in range(n_shards)
                          if recv_off[s, o] <= row
                          < recv_off[s, o] + ss[o, s]]
                assert len(owners) == 1, (s, row, owners)
                o = owners[0]
                assert o != s  # boundary rows come from peers
                slot = row - int(recv_off[s, o])
                global_src = o * nl + int(gather[o, int(io[o, s]) + slot])
                got.append((global_src, s * nl + int(tg), int(ty)))
        assert sorted(got) == sorted(want)


@settings(max_examples=15, deadline=None)
@given(corpora(), st.integers(1, 4))
def test_gcn_node_shard_conserves_weighted_edges(raw, n_shards):
    """GCN node sharding preserves the weighted edge multiset of the
    normalized adjacency: every (global src, global tgt, weight) appears
    exactly once across the local/boundary lanes, boundary rows resolve
    through send_idx, and both lanes are target-sorted."""
    from ggnn_tpu.parallel.node_shard import (plan_gcn_shard_caps,
                                              shard_gcn_batch)
    proc = packing.preprocess_gcn(raw, [0], {}, False)
    caps = packing.plan_gcn_capacities(proc, 40)
    for b in packing.pack_gcn_batches(proc, 40, caps, 8, 2, False, None):
        ns_caps = plan_gcn_shard_caps([b], n_shards)
        sb = shard_gcn_batch(b, ns_caps)
        nl, b_cap = ns_caps.nodes_local, ns_caps.boundary
        w = np.asarray(b.edge_weights)
        real = w != 0.0
        want = sorted(zip(np.asarray(b.edge_sources)[real].tolist(),
                          np.asarray(b.edge_targets)[real].tolist(),
                          w[real].tolist()))
        got = []
        send = np.asarray(sb.send_idx)
        for s in range(n_shards):
            lw = np.asarray(sb.loc_w)[s]
            for src, tg, ww in zip(np.asarray(sb.loc_src)[s][lw != 0],
                                   np.asarray(sb.loc_tgt)[s][lw != 0],
                                   lw[lw != 0]):
                got.append((s * nl + int(src), s * nl + int(tg),
                            float(ww)))
            bw = np.asarray(sb.bnd_w)[s]
            for src, tg, ww in zip(np.asarray(sb.bnd_src)[s][bw != 0],
                                   np.asarray(sb.bnd_tgt)[s][bw != 0],
                                   bw[bw != 0]):
                owner, slot = int(src) // b_cap, int(src) % b_cap
                assert owner != s
                got.append((owner * nl + int(send[owner, s, slot]),
                            s * nl + int(tg), float(ww)))
            assert np.all(np.diff(np.asarray(sb.loc_tgt)[s]) >= 0)
            assert np.all(np.diff(np.asarray(sb.bnd_tgt)[s]) >= 0)
        assert sorted(got) == want


@settings(max_examples=15, deadline=None)
@given(corpora())
def test_async_segments_cover_schedule_exactly(raw):
    """Segmented lanes hold exactly the uniform schedule's messages and
    receivers, per (round, step), for arbitrary corpora."""
    from ggnn_tpu.data.async_schedule import (pack_async_batches,
                                              plan_async_capacities,
                                              preprocess_async)
    meta = infer_metadata([raw], True)
    proc = preprocess_async(raw, meta.num_edge_types, True, 2, 30,
                            [0], {}, False)
    caps = plan_async_capacities(proc, meta.num_edge_types, 40, 2)
    for b in pack_async_batches(proc, meta.num_edge_types, 40, caps, 2,
                                30, 8, meta.annotation_size, False):
        if b.seg_rounds is None:
            continue
        for r in range(2):
            # real message count per round matches
            uniform_real = int((np.asarray(b.msg_targets[r])
                                < caps.receiving_nodes).sum())
            seg_real = 0
            covered_steps = []
            for seg in b.seg_rounds[r]:
                n, rc_cap = seg.old_compact.shape
                seg_real += int((np.asarray(seg.msg_target) < rc_cap).sum())
                covered_steps.append(n)
            assert seg_real == uniform_real


@settings(max_examples=20, deadline=None)
@given(corpora(), st.sampled_from([1.0, 1.05, 1.3]),
       st.integers(0, 2**31 - 1))
def test_pack_is_shuffle_robust_at_tight_margins(raw, margin, seed):
    """With every capacity enforced in fits(), packing must succeed for
    ANY shuffle at ANY margin >= 1.0: all graphs covered exactly once,
    every batch within caps, and every batch carries the combined lane
    (the pytree structure never degrades mid-epoch)."""
    num_edge_types = 3
    proc = packing.preprocess_sparse(raw, num_edge_types, True,
                                     [0], {}, False)
    caps = packing.plan_capacities(proc, num_edge_types, 40, margin=margin)
    rng = np.random.RandomState(seed)
    for _ in range(3):  # three shuffled "epochs"
        batches = list(packing.pack_sparse_batches(
            proc, num_edge_types, 40, caps, 8, 2, True, rng))
        assert sum(int(b.num_graphs) for b in batches) == len(raw)
        for b in batches:
            assert b.edge_sources_all is not None
            assert float(np.asarray(b.edge_mask_all).sum()) <= caps.edges_all
            em = np.asarray(b.edge_mask)
            for t in range(num_edge_types):
                assert int((em[t] > 0).sum()) <= caps.edges_per_type
