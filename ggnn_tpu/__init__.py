"""ggnn_tpu — a TPU-native gated graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
microsoft/gated-graph-neural-network-samples: GGNN (dense & sparse), GCN,
R-GCN-by-config and asynchronous scheduled propagation over molecular
graphs, with a full training framework (config merge, Adam + per-leaf
gradient clipping, early stopping, best-on-validation checkpointing,
metrics/logging) and multi-chip scaling via `jax.sharding` meshes.

Layering (bottom to top):
  ops/        pure-functional compute ops with TF1.3-compatible numerics
              (GRU cell gate math, weight-dropout MLP, masked segment ops)
              plus Pallas TPU kernels for the hot paths
  graph.py    static-shape padded graph-batch pytrees (sparse + dense)
  data/       JSON loaders, metadata inference, node-budget/bucket packers,
              QM9 extraction, synthetic molecule generator
  models/     GGNN sparse/dense, GCN, async scheduled propagation
  parallel/   device-mesh utilities, data-parallel and edge-partitioned
              training steps
  training/   config system, optimizer, epoch loop, checkpointing, metrics
"""

__version__ = "0.1.0"

from ggnn_tpu.graph import GraphBatch, DenseGraphBatch
from ggnn_tpu.utils.constants import SMALL_NUMBER, CHEMICAL_ACCURACIES


def __getattr__(name):
    # Lazy top-level conveniences (keep `import ggnn_tpu` light; Runner
    # pulls in the full training stack).
    if name == "Runner":
        from ggnn_tpu.training.runner import Runner
        return Runner
    if name == "Predictor":
        from ggnn_tpu.serving import Predictor
        return Predictor
    if name == "make_mesh":
        from ggnn_tpu.parallel import make_mesh
        return make_mesh
    if name == "resolve_config":
        from ggnn_tpu.training.config import resolve_config
        return resolve_config
    if name == "synthetic_molecules":
        from ggnn_tpu.data.synthetic import synthetic_molecules
        return synthetic_molecules
    raise AttributeError(f"module 'ggnn_tpu' has no attribute '{name}'")
