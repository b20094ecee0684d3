"""Serving Predictor: checkpoint -> precompiled inference, no training
data required."""

import numpy as np
import pytest

import jax

from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.serving import Predictor
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.runner import Runner


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = default_params_for("sparse")
    cfg.update({"hidden_size": 16, "num_epochs": 1, "batch_size": 300})
    runner = Runner("sparse", cfg, log_dir=str(tmp), quiet=True,
                    tensorboard=False,
                    train_data=synthetic_molecules(60, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    runner.train()
    return runner


def test_predictor_matches_runner_predict(trained):
    mols = synthetic_molecules(7, seed=5)
    predictor = Predictor.from_checkpoint(
        trained.best_model_file, "sparse", max_nodes=256, max_graphs=32)
    out = predictor(mols)
    assert out.shape == (1, 7)
    want = np.concatenate([o for o in trained.predict(mols)], axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_predictor_microbatches_large_requests(trained):
    mols = synthetic_molecules(40, seed=6)
    predictor = Predictor.from_checkpoint(
        trained.best_model_file, "sparse", max_nodes=128, max_graphs=16)
    out = predictor(mols)
    assert out.shape == (1, 40)
    assert np.isfinite(out).all()


def test_predictor_from_orbax_checkpoint(trained, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ggnn_tpu.training.checkpoint import save_checkpoint
    ckpt_dir = str(tmp_path / "serve_orbax")
    save_checkpoint(ckpt_dir, trained.config, trained.state,
                    trained.train_step_id, trained.valid_step_id)
    mols = synthetic_molecules(4, seed=7)
    predictor = Predictor.from_checkpoint(ckpt_dir, "sparse",
                                          max_nodes=256, max_graphs=32)
    out = predictor(mols)
    want = np.concatenate([o for o in trained.predict(mols)], axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
