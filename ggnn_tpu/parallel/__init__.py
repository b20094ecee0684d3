"""Multi-chip scaling layer (the subsystem the reference lacks entirely —
SURVEY.md §2 rows 17-18: no parallelism, no communication backend).

TPU-native design: a named `jax.sharding.Mesh` with axes

  data — batch-level data parallelism: independently packed super-graph
         batches are stacked along a leading axis and split across chips;
         gradients are combined with `psum` (rides ICI within a slice,
         DCN across slices).
  edge — graph parallelism: the packed super-graph's *edge set* is
         partitioned across chips (the graph analog of sequence/context
         parallelism). Each chip keeps a full replica of the node states,
         computes messages for its edge shard, segment-sums them into
         partial per-node sums, and a `psum` over the edge axis completes
         the aggregation. Propagation attention's segment-softmax
         distributes the same way (pmax/psum of segment statistics).

Everything is expressed with `jax.shard_map` over the mesh + XLA
collectives — no NCCL/MPI analog, per SURVEY.md §5.8.
"""

from ggnn_tpu.parallel.mesh import make_mesh, overlap_compiler_options
from ggnn_tpu.parallel.stacking import (
    empty_batch_like,
    repad_edges,
    stack_batches,
    stack_from_process_local,
    stacked_batch_specs,
)
from ggnn_tpu.parallel.step import make_parallel_steps
