"""Real-QM9 1-epoch parity vs the reference README (VERDICT round-3 #4a).

Auto-activates the moment a real QM9 extraction exists — produce one with

    python -m ggnn_tpu.data.qm9 --tarball /path/dsgdb9nsd.xyz.tar.bz2

(or `ggnn-tpu-get-data` with network) and point GGNN_QM9_DIR at the
directory holding molecules_{train,valid}.json (default: repo root,
then ./data). Skips otherwise — network and rdkit are unavailable in
the build environment, so this is the committed harness the reference's
numbers run through on any machine that has the tarball.

Pinned numbers (reference README.md:66-67, dense GGNN, QM9 mu task,
epoch 1):

    train: loss 0.52315  MAE 0.64241  error_ratio 9.65831
    valid: loss 0.26930  MAE 0.55949  error_ratio 8.41163

Tolerance: +-25% relative. Epoch-1 metrics depend on the weight-init
stream and shuffle order, which CANNOT be bit-matched across TF1 and
JAX PRNGs; what this pins is the statistical claim that one epoch of
this framework's dense model on the real corpus lands where the
reference lands (a wrong loss normalization, a broken extraction, or a
mis-scaled target would miss by far more than 25%). Exact numerics are
pinned elsewhere: TF1 golden fixtures replay the reference's own
execution weight-for-weight (tests/test_tf1_golden.py)."""

import json
import os

import numpy as np
import pytest

REF = {
    "train": (0.52315, 0.64241, 9.65831),
    "valid": (0.26930, 0.55949, 8.41163),
}
RTOL = 0.25


def _find_qm9_dir():
    roots = []
    if os.environ.get("GGNN_QM9_DIR"):
        roots.append(os.environ["GGNN_QM9_DIR"])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    roots += [here, os.path.join(here, "data"), "."]
    for root in roots:
        if all(os.path.exists(os.path.join(root, f"molecules_{s}.json"))
               for s in ("train", "valid")):
            return root
    return None


def test_qm9_epoch1_matches_reference_readme(tmp_path):
    root = _find_qm9_dir()
    if root is None:
        pytest.skip("real QM9 extraction not present (set GGNN_QM9_DIR "
                    "or run `python -m ggnn_tpu.data.qm9 --tarball ...`)")
    with open(os.path.join(root, "molecules_valid.json")) as f:
        valid = json.load(f)
    # The real split has 13,082 validation molecules (valid_idx.json);
    # anything smaller is a fixture corpus, not QM9.
    if len(valid) < 13000:
        pytest.skip(f"{root} holds a non-QM9 fixture corpus "
                    f"({len(valid)} valid molecules)")

    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config("dense", None, '{"num_epochs": 1}')
    runner = Runner("dense", cfg, data_dir=root,
                    log_dir=str(tmp_path / "logs"),
                    quiet=True, tensorboard=False)
    log = runner.train()
    assert len(log) == 1
    for split, key in (("train", "train_results"),
                       ("valid", "valid_results")):
        loss, accs, errs, _speed = log[0][key]
        want_loss, want_mae, want_ratio = REF[split]
        got = np.array([loss, accs[0], errs[0]])
        want = np.array([want_loss, want_mae, want_ratio])
        np.testing.assert_allclose(
            got, want, rtol=RTOL,
            err_msg=f"epoch-1 {split} (loss, MAE, error_ratio) off by "
                    f">{RTOL:.0%} vs README.md:66-67")
