"""Deployment artifacts (ggnn_tpu/export.py): Predictor -> .ggnnx
(pinned StableHLO + weights) -> ExportedPredictor, numerics-identical
to the live model and immune to model-code drift."""

import numpy as np
import pytest

from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.export import export_predictor, load_predictor
from ggnn_tpu.serving import Predictor
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.runner import Runner


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    cfg = default_params_for("sparse")
    cfg.update({"hidden_size": 16, "num_epochs": 1, "batch_size": 300})
    runner = Runner("sparse", cfg, log_dir=str(tmp), quiet=True,
                    tensorboard=False,
                    train_data=synthetic_molecules(60, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    runner.train()
    return runner


@pytest.fixture(scope="module")
def artifact(trained, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("artifact")
    predictor = Predictor.from_checkpoint(
        trained.best_model_file, "sparse", max_nodes=128, max_graphs=16)
    path = str(tmp / "sparse.ggnnx")
    export_predictor(predictor, path)
    return path, predictor


def test_roundtrip_matches_live_predictor(artifact):
    path, live = artifact
    exported = load_predictor(path)
    assert exported.model is None  # no model code behind the artifact
    mols = synthetic_molecules(7, seed=5)
    np.testing.assert_allclose(exported(mols), live(mols),
                               rtol=1e-6, atol=1e-7)
    # single-request fast path dispatches into the same envelope shape
    np.testing.assert_allclose(exported([mols[0]]), live([mols[0]]),
                               rtol=1e-6, atol=1e-7)


def test_artifact_pins_numerics_against_model_drift(artifact, monkeypatch):
    """The whole point: after the artifact is written, edits to the live
    model code must NOT change what it computes."""
    path, live = artifact
    mols = synthetic_molecules(5, seed=6)
    want = live(mols)

    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    monkeypatch.setattr(
        SparseGGNN, "forward",
        lambda self, params, batch, **kw: __import__("jax").numpy.zeros(
            (batch.node_features.shape[0],
             batch.node_features.shape[1])))
    # A freshly constructed live predictor now computes garbage...
    fresh = Predictor(live.variant, live.config, live.meta,
                      {"params": live.params}, max_nodes=128,
                      max_graphs=16)
    assert not np.allclose(fresh(mols), want, rtol=1e-4, atol=1e-5)
    # ...but the artifact still serves the pinned computation.
    exported = load_predictor(path)
    np.testing.assert_allclose(exported(mols), want, rtol=1e-6, atol=1e-7)


def test_dense_family_buckets_and_request_order(tmp_path):
    cfg = default_params_for("blocked")
    cfg.update({"hidden_size": 16, "num_epochs": 1, "batch_size": 8})
    runner = Runner("blocked", cfg, log_dir=str(tmp_path), quiet=True,
                    tensorboard=False,
                    train_data=synthetic_molecules(40, seed=2),
                    valid_data=synthetic_molecules(12, seed=3))
    runner.train()
    live = Predictor.from_checkpoint(runner.best_model_file, "blocked")
    path = str(tmp_path / "blocked.ggnnx")
    export_predictor(live, path)
    exported = load_predictor(path)
    # Mixed sizes hit several buckets; bucketing re-orders internally
    # and the scatter back to request order must match the live path.
    mols = synthetic_molecules(11, seed=7)
    np.testing.assert_allclose(exported(mols), live(mols),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("variant", ["gcn", "gcn_blocked", "dense", "async"])
def test_every_variant_exports(variant, tmp_path):
    """PARITY.md claims .ggnnx covers every variant; sparse/blocked are
    pinned above — this drives the rest end-to-end (train -> export ->
    load -> predict parity)."""
    cfg = default_params_for(variant)
    cfg.update({"hidden_size": 8, "num_epochs": 1})
    if variant == "gcn":
        cfg["batch_size"] = 300
    elif variant == "async":
        # synthetic molecules can exceed the reference's 15-substep
        # schedule-depth cap at this corpus size
        cfg.update({"num_nodes": 300, "propagation_substeps": 20})
    else:
        cfg.update({"batch_size": 8, "drop_remainder": False})
    runner = Runner(variant, cfg, log_dir=str(tmp_path), quiet=True,
                    tensorboard=False,
                    train_data=synthetic_molecules(30, seed=0),
                    valid_data=synthetic_molecules(10, seed=1))
    runner.train()
    live = Predictor.from_checkpoint(runner.best_model_file, variant,
                                     max_nodes=128, max_graphs=16)
    path = str(tmp_path / f"{variant}.ggnnx")
    export_predictor(live, path)
    exported = load_predictor(path)
    mols = synthetic_molecules(5, seed=7)
    np.testing.assert_allclose(exported(mols), live(mols),
                               rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def exported_pair(artifact):
    path, live = artifact
    return live, load_predictor(path)


def test_property_random_requests_match(exported_pair):
    """Hypothesis sweep: for random request graphs inside the envelope,
    the artifact and the live model agree (packing dispatch included)."""
    from hypothesis import given, settings, strategies as st

    live, exported = exported_pair

    @st.composite
    def requests(draw):
        graphs = []
        for _ in range(draw(st.integers(1, 4))):
            n = draw(st.integers(2, 12))
            edges = [[draw(st.integers(0, n - 1)), draw(st.integers(1, 3)),
                      draw(st.integers(0, n - 1))]
                     for _ in range(draw(st.integers(1, 16)))]
            graphs.append({"targets": [[0.0]], "graph": edges,
                           "node_features": [[1.0, 0.0]] * n})
        return graphs

    @settings(max_examples=20, deadline=None)
    @given(requests())
    def check(mols):
        np.testing.assert_allclose(exported(mols), live(mols),
                                   rtol=1e-6, atol=1e-7)

    check()


def test_unknown_batch_shape_is_a_clear_error(artifact):
    path, _ = artifact
    exported = load_predictor(path)
    exported._exported_fns = {}  # simulate an artifact missing the shape
    with pytest.raises(ValueError, match="not present in the artifact"):
        exported(synthetic_molecules(2, seed=8))


def test_format_version_check(artifact, tmp_path):
    import json
    import zipfile

    path, _ = artifact
    bad = str(tmp_path / "bad.ggnnx")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "meta.json":
                meta = json.loads(data)
                meta["format_version"] = 999
                data = json.dumps(meta).encode()
            zout.writestr(item, data)
    with pytest.raises(ValueError, match="format_version"):
        load_predictor(bad)


def test_artifact_is_pickle_free(artifact):
    """Loading a .ggnnx from an untrusted source must not be able to
    execute code: weights travel as an npz of json-path-keyed arrays
    (read with allow_pickle=False), never as a pickle."""
    import zipfile

    path, live = artifact
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert "params.npz" in names
    assert not [n for n in names if n.endswith(".pkl")]
    # and the codec round-trips the live predictor's exact pytree
    from ggnn_tpu.export import _flatten_params, _unflatten_params
    import jax

    host = jax.device_get(live.params)
    rebuilt = _unflatten_params(_flatten_params(host))
    assert (jax.tree_util.tree_structure(rebuilt)
            == jax.tree_util.tree_structure(host))
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                    jax.tree_util.tree_leaves(host)):
        np.testing.assert_array_equal(a, b)


def test_params_codec_nested_lists():
    from ggnn_tpu.export import _flatten_params, _unflatten_params

    tree = {"layers": [{"w": np.arange(4.0).reshape(2, 2),
                        "cell": {"k": np.ones(3, np.float32)}},
                       {"w": np.zeros((1, 1))}],
            "heads": {"7": [np.float64(2.5) * np.ones(2)]}}
    out = _unflatten_params(_flatten_params(tree))
    assert isinstance(out["layers"], list) and len(out["layers"]) == 2
    np.testing.assert_array_equal(out["layers"][0]["cell"]["k"],
                                  np.ones(3, np.float32))
    assert out["layers"][0]["cell"]["k"].dtype == np.float32
    np.testing.assert_array_equal(out["heads"]["7"][0], [2.5, 2.5])


def test_cli_export_flag(trained, tmp_path):
    from ggnn_tpu.cli import main

    out = str(tmp_path / "cli.ggnnx")
    rc = main(["sparse", "--restore", trained.best_model_file,
               "--export-artifact", out, "--quiet"])
    assert rc == 0
    exported = load_predictor(out)
    mols = synthetic_molecules(3, seed=9)
    assert np.isfinite(exported(mols)).all()
    # --export-artifact without --restore is a usage error
    assert main(["sparse", "--export-artifact", out, "--quiet"]) == 2


def test_server_serves_artifact(artifact):
    """The HTTP server accepts a .ggnnx artifact as --checkpoint."""
    import json
    import urllib.request

    from ggnn_tpu.export import load_predictor as lp
    from ggnn_tpu.server import PredictionServer

    path, live = artifact
    server = PredictionServer(lp(path), port=0)
    server.warmup()
    server.start()
    host, port = server.address
    try:
        mols = synthetic_molecules(3, seed=10)
        req = urllib.request.Request(
            f"http://{host}:{port}/predict",
            data=json.dumps({"graphs": mols}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = np.asarray(json.loads(resp.read())["outputs"])
        np.testing.assert_allclose(out, live(mols), rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
