"""Golden fixture for CudnnCompatibleGRUCell from TF's real kernel.

tf.contrib.cudnn_rnn no longer exists in TF2, so the full-model golden
cases (generate.py) cannot execute the reference with
graph_rnn_cell=CudnnCompatibleGRUCell. But the cuDNN GRU formulation the
contrib cell implements (reset gate applied AFTER the recurrent matmul,
separate input/recurrent candidate kernels and biases) is exactly what
keras `GRUCell(reset_after=True)` computes — that flag exists precisely
for cuDNN weight compatibility. This script runs the real (legacy) keras
kernel eagerly on random inputs/states over several chained steps and
dumps weights + per-step outputs; tests/test_tf1_golden.py maps the
keras weights onto ggnn_tpu.ops.cells.cudnn_gru_apply's parameter layout
and pins allclose agreement, making the cuDNN cell's oracle TF's own
implementation rather than a NumPy re-derivation.

Gate-order mapping (keras kernels are [z | r | c] column blocks; the
contrib cell's gates kernel is [r | u] with u == z):
    gates_kernel[:, :H]   <- kernel/recurrent[:, H:2H]   (reset)
    gates_kernel[:, H:]   <- kernel/recurrent[:, :H]     (update)
    gates_bias            <- input_bias + recurrent_bias (both blocks)
    candidate_input_*     <- kernel[:, 2H:],  bias[0, 2H:]
    candidate_hidden_*    <- recurrent[:, 2H:], bias[1, 2H:]

Run: python tools/tf1_golden/generate_cudnn.py   (no network needed).
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures", "tf1")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

# Residual concatenation feeds the cell inputs wider than the state
# (chem_tensorflow_sparse.py:211-216), so cover input_size != hidden.
CASES = {
    "cudnn_gru_cell": dict(batch=7, input_size=48, hidden_size=16, steps=5,
                           seed=41),
    "cudnn_gru_cell_square": dict(batch=5, input_size=16, hidden_size=16,
                                  steps=3, seed=42),
}


def generate(name, spec):
    import tf_keras

    rng = np.random.RandomState(spec["seed"])
    h = spec["hidden_size"]
    cell = tf_keras.layers.GRUCell(
        h, activation="tanh", recurrent_activation="sigmoid",
        reset_after=True, implementation=1)
    cell.build((spec["batch"], spec["input_size"]))

    # Random weights everywhere (keras inits biases to zero, which would
    # mask bias-mapping mistakes).
    kernel = rng.uniform(-0.5, 0.5, (spec["input_size"], 3 * h))
    recurrent = rng.uniform(-0.5, 0.5, (h, 3 * h))
    bias = rng.uniform(-0.5, 0.5, (2, 3 * h))
    cell.set_weights([kernel.astype(np.float32),
                      recurrent.astype(np.float32),
                      bias.astype(np.float32)])

    xs = rng.uniform(-1, 1, (spec["steps"], spec["batch"],
                             spec["input_size"])).astype(np.float32)
    state = rng.uniform(-1, 1, (spec["batch"], h)).astype(np.float32)

    import tensorflow as tf  # deferred like tf_keras (env setdefaults)
    outputs = []
    cur = state
    for t in range(spec["steps"]):
        _, [cur] = cell(tf.constant(xs[t]), [tf.constant(cur)])
        cur = cur.numpy()
        outputs.append(cur)

    payload = {
        "meta": np.array(json.dumps({"case": name, **spec})),
        "kernel": kernel.astype(np.float32),
        "recurrent_kernel": recurrent.astype(np.float32),
        "bias": bias.astype(np.float32),
        "inputs": xs,
        "init_state": state,
        "outputs": np.stack(outputs),
    }
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    out_path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    np.savez_compressed(out_path, **payload)
    print(f"{name}: wrote {out_path} (outputs {np.stack(outputs).shape})")


def main():
    for name, spec in CASES.items():
        generate(name, spec)


if __name__ == "__main__":
    main()
