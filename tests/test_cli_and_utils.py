"""CLI surface and utility-module tests."""

import json
import os

import numpy as np
import pytest

import jax


def test_cli_end_to_end_train_and_evaluate(tmp_path):
    """Drive cli.main in-process: train on synthetic data, then restore
    + --evaluate with the saved checkpoint."""
    from ggnn_tpu.cli import main

    rc = main(["sparse", "--synthetic", "60",
               "--config", json.dumps({"num_epochs": 1, "hidden_size": 8,
                                       "batch_size": 300}),
               "--log_dir", str(tmp_path), "--quiet"])
    assert rc == 0
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith("best.pickle")]
    assert len(ckpts) == 1
    logs = [f for f in os.listdir(tmp_path) if f.endswith("_log.json")]
    assert len(logs) == 1
    with open(tmp_path / logs[0]) as f:
        assert json.load(f)[0]["epoch"] == 1

    rc = main(["sparse", "--synthetic", "60",
               "--config", json.dumps({"num_epochs": 1, "hidden_size": 8,
                                       "batch_size": 300}),
               "--log_dir", str(tmp_path), "--quiet",
               "--restore", str(tmp_path / ckpts[0]), "--evaluate"])
    assert rc == 0


def test_cli_bad_variant_rejected():
    from ggnn_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["nonsense"])


def test_threaded_iterator_propagates_worker_errors():
    from ggnn_tpu.utils.prefetch import ThreadedIterator

    def boom():
        yield 1
        raise RuntimeError("worker died")

    it = ThreadedIterator(boom())
    seen = []
    with pytest.raises(RuntimeError, match="worker died"):
        for x in it:
            seen.append(x)
    assert seen == [1]


def test_threaded_iterator_order_preserved():
    from ggnn_tpu.utils.prefetch import ThreadedIterator
    assert list(ThreadedIterator(iter(range(50)), max_queue_size=3)) == \
        list(range(50))


def test_make_epochs_fn_runs_epochs():
    """timing harness: n chained epochs of a counting step."""
    import jax.numpy as jnp
    from ggnn_tpu.utils.timing import make_epochs_fn

    def step(state, batch, key):
        return state + jnp.sum(batch), jnp.sum(batch)

    batches = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    # real PRNG keys: the harness folds the epoch index into each one
    # (fresh dropout draws per epoch), which requires uint32 key data
    import jax
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    epochs_fn = make_epochs_fn(step)
    state, last_loss = epochs_fn(jnp.zeros(()), [batches], [keys], 4)
    # 4 epochs x sum over all batches (0+1)+(2+3)+(4+5) = 15 -> 60
    assert float(state) == 60.0
    assert float(last_loss) == 9.0  # last batch sum of the last epoch


def test_summary_sink_writes_scalars(tmp_path):
    from ggnn_tpu.training.summaries import SummarySink
    sink = SummarySink(str(tmp_path), "runX")
    sink.add_batch("train", 0, 1.25, np.array([0.5]), [0])
    sink.add_batch("validation", 0, 1.0, np.array([0.4]), [0])
    sink.close()
    files = []
    for root, _, fs in os.walk(tmp_path):
        files += [os.path.join(root, f) for f in fs]
    assert any("train" in f for f in files)
    assert any("validation" in f for f in files)
