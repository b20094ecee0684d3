"""Honest device timing over high-latency transports.

Under the tunneled TPU backend, `block_until_ready` can return before
device work completes and a host round-trip costs ~30ms, so python-loop
timing is meaningless. The reliable recipe:

  1. chain all iterations ON DEVICE (lax.scan over stacked batches,
     fori_loop over epochs) so nothing can be elided or overlapped away;
  2. force completion with a scalar fetch (`float(...)`), which is the
     only operation that provably waits;
  3. difference two run lengths (n1, n2 epochs) so the fixed round-trip
     and dispatch latency cancels: per_epoch = (T2 - T1) / (n2 - n1).
"""

import time
from typing import Callable, Tuple

import jax


def make_epochs_fn(step_fn: Callable):
    """Build jit(epochs_fn)(state, groups, key_groups, n_epochs).

    `step_fn(state, batch, key) -> (state, loss)`. `groups` is a list of
    stacked batch pytrees (one per distinct shape group, leading step
    axis); groups run sequentially inside one epoch. Batches/keys are
    ARGUMENTS, never closures — closed-over device arrays would be baked
    into the HLO as constants (hundreds of MB through the remote
    compiler). `n_epochs` is a traced scalar so one compilation serves
    every run length.
    """

    def one_epoch(state, groups, key_groups, epoch):
        if len(groups) != len(key_groups):
            raise ValueError(
                f"{len(groups)} batch groups but {len(key_groups)} key "
                "groups")
        if not groups:
            raise ValueError("no batch groups to run")
        loss = None
        for batches, keys in zip(groups, key_groups):
            def body(s, bk):
                b, k = bk
                # Fresh dropout draws every epoch: replaying the same
                # per-batch keys each fori_loop iteration would train a
                # FIXED thinned network per batch.
                s, l = step_fn(s, b, jax.random.fold_in(k, epoch))
                return s, l
            state, losses = jax.lax.scan(body, state, (batches, keys))
            loss = losses[-1]
        return state, loss

    def epochs(state, groups, key_groups, n_epochs):
        def body(epoch, carry):
            state, _ = carry
            return one_epoch(state, groups, key_groups, epoch)
        return jax.lax.fori_loop(0, n_epochs, body,
                                 (state, jax.numpy.zeros(())))

    return jax.jit(epochs)


def time_epochs(epochs_fn, state, groups, key_groups,
                n1: int = 1, n2: int = 3) -> Tuple[float, float]:
    """Returns (seconds_per_epoch, final_loss). Compiles once (dynamic
    epoch count), then times two run lengths with forcing scalar
    fetches; the difference cancels fixed dispatch/round-trip latency."""
    _, l0 = epochs_fn(state, groups, key_groups, 1)
    float(l0)  # compile + warm
    t0 = time.time()
    _, l1 = epochs_fn(state, groups, key_groups, n1)
    loss = float(l1)
    t1 = time.time()
    _, l2 = epochs_fn(state, groups, key_groups, n2)
    loss = float(l2)
    t2 = time.time()
    per_epoch = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    return per_epoch, loss
