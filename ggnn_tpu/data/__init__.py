from ggnn_tpu.data.loader import DatasetMeta, load_graphs_json, infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.data.packing import (
    PackCapacities,
    preprocess_sparse,
    plan_capacities,
    pack_sparse_batches,
    preprocess_dense,
    pack_dense_batches,
    DENSE_BUCKET_SIZES,
)
