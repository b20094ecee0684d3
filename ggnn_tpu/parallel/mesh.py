"""Device-mesh construction for the (data, edge) axis layout."""

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
EDGE_AXIS = "edge"


def make_mesh(n_data: Optional[int] = None, n_edge: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A `Mesh` with axes ("data", "edge") over `n_data * n_edge` devices.

    With `n_data=None`, uses all available devices divided by `n_edge`.
    On a real multi-chip TPU slice, `jax.devices()` is ordered so that
    the trailing (fastest-varying) axis maps to physically adjacent
    chips — the edge axis carries per-propagation-step psums, so it gets
    the trailing position and therefore the shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_edge != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_edge={n_edge}")
        n_data = len(devices) // n_edge
    need = n_data * n_edge
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_edge} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_edge)
    return Mesh(arr, (DATA_AXIS, EDGE_AXIS))


# XLA:TPU lowers all-to-all and ragged-all-to-all SYNCHRONOUSLY by
# default (measured round 5: the compiled v5e HLO has bare
# `all-to-all(...)` ops, no start/done pair — only collective-permute
# is async out of the box). The node-shard design's headline property —
# overlapping the boundary exchange with the local-lane gather/
# segment-sum (SURVEY §5.7) — therefore needs these compiler options;
# with them, every transport lowers as an async start/done pair and
# XLA's latency-hiding scheduler places the independent local-lane
# fusions between start and done (pinned per transport by
# tests/test_tpu_aot.py::test_boundary_exchange_overlaps_local_compute).
_TPU_OVERLAP_OPTIONS = {
    "xla_tpu_enable_async_all_to_all": "true",
    "xla_tpu_enable_async_ragged_all_to_all": "true",
    "xla_tpu_enable_latency_hiding_scheduler": "true",
}


def overlap_compiler_options(mesh: Mesh) -> dict:
    """XLA:TPU compiler options enabling async collectives + the
    latency-hiding scheduler for multi-chip steps on TPU meshes.

    Empty for single-device meshes (no collectives to overlap) and for
    non-TPU platforms (the options are TPU-specific; XLA:CPU — where
    the virtual 8-device test meshes run — would reject them)."""
    if mesh.size <= 1:
        return {}
    platform = getattr(mesh.devices.flat[0], "platform", "").lower()
    if platform != "tpu":
        return {}
    return dict(_TPU_OVERLAP_OPTIONS)


def process_aligned_data_rows(mesh: Mesh):
    """This process's data-axis rows, when the mesh is process-aligned.

    Returns the list of data indices whose entire device row belongs to
    the calling process — the rows whose batches this host should pack
    and feed (`stack_from_process_local`). Returns None (meaning: feed
    replicated global stacks) when single-process, when any row spans
    processes (e.g. the edge axis crosses hosts), or when some process
    owns no row — the None decision is identical on every process, so
    no host takes a divergent code path into a collective.
    """
    if jax.process_count() == 1:
        return None
    dev = mesh.devices  # [n_data, n_edge]
    row_owner = []
    for i in range(dev.shape[0]):
        owners = {d.process_index for d in dev[i].flat}
        if len(owners) != 1:
            return None
        row_owner.append(owners.pop())
    if set(row_owner) != set(range(jax.process_count())):
        return None
    return [i for i, o in enumerate(row_owner)
            if o == jax.process_index()]


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group setup (SURVEY §5.8): call once per host
    before `make_mesh()` on a multi-host slice. Thin wrapper over
    `jax.distributed.initialize` — coordinator address/process counts
    come from the TPU environment automatically on Cloud TPU; kwargs
    pass through for manual setups. After this, `jax.devices()` spans
    every host and the mesh axes ride ICI within a slice and DCN across
    slices."""
    jax.distributed.initialize(**kwargs)
