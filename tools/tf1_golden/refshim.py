"""Execute the reference (TF 1.3 code at /root/reference) under TF 2.x's
compat.v1 layer, to generate golden numeric fixtures.

The reference code itself is never copied — it is imported read-only from
REFERENCE_DIR and run to produce JSON fixtures that the framework's tests
pin against (tests/test_tf1_golden.py). This gives an oracle that is the
*actual* TF implementation (rnn_cell_impl.GRUCell, v1 AdamOptimizer, TF
segment ops), not a NumPy re-derivation by the same author.

Requires tensorflow>=2 plus the tf_keras legacy package
(TF_USE_LEGACY_KERAS=1) so tf.compat.v1.nn.rnn_cell resolves.
"""

import os
import sys
import types

REFERENCE_DIR = os.environ.get("GGNN_REFERENCE_DIR", "/root/reference")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# oneDNN reorders float reductions; keep the stock kernels so fixture
# numerics are reproducible across machines.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")


def install_tf1_shim():
    """Make `import tensorflow as tf` resolve to tf.compat.v1 (graph
    mode, placeholders) with a minimal tf.contrib for the reference's
    two contrib uses (contrib.rnn.GRUCell; cudnn_rnn is not shimmed —
    CudnnCompatibleGRUCell configs are generated from formula instead)."""
    if not os.path.isdir(REFERENCE_DIR):
        raise FileNotFoundError(
            f"reference checkout not found at '{REFERENCE_DIR}' — set "
            "GGNN_REFERENCE_DIR to the "
            "gated-graph-neural-network-samples directory (a missing "
            "path would otherwise surface as a cryptic ModuleNotFound "
            "or patch an unrelated top-level `utils` module)")
    import tensorflow as tf2
    v1 = tf2.compat.v1
    v1.disable_v2_behavior()  # includes disabling eager execution

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.rnn = v1.nn.rnn_cell  # TF1.3 tf.contrib.rnn.GRUCell == nn.rnn_cell.GRUCell

    shim = types.ModuleType("tensorflow")
    for name in dir(v1):
        if not name.startswith("__"):
            setattr(shim, name, getattr(v1, name))
    shim.contrib = contrib
    shim.compat = tf2.compat
    sys.modules["tensorflow"] = shim
    sys.modules["tensorflow.contrib"] = contrib

    if "docopt" not in sys.modules:
        # The reference imports docopt at module top level for its CLI;
        # the generator never calls main(), so a stub suffices.
        docopt_mod = types.ModuleType("docopt")
        docopt_mod.docopt = lambda *a, **k: {}
        sys.modules["docopt"] = docopt_mod
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    # NumPy 2 (NEP 50) promotes `np.float64_scalar * float32_array` to
    # float64; under the reference's 2018-era numpy the MLP init stayed
    # float32. Restore the era dtype without changing the values.
    import numpy as np
    import utils as ref_utils
    orig_init = ref_utils.MLP.init_weights
    ref_utils.MLP.init_weights = (
        lambda self, shape: orig_init(self, shape).astype(np.float32))
    return shim
