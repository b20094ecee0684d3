"""The gather issue-floor microbench (round-5 VERDICT item #3: the
decisive probe behind the round-2 ELL closure, previously /tmp-only).

Measures the per-edge-row cost of the one operation every edge-list
aggregation design on this hardware must perform: gathering one H-wide
row from a VMEM-resident node-state table at an address that comes from
an index load. A Pallas kernel does ONLY that work — no matmul, no
scatter — with the gather loop unrolled 1x / 4x / 8x.

The recorded round-2 result (one v5e, H=128 MXU-aligned rows, KE=96,
dense ELL occupancy — the archived kernel's best case):

    | gather loop unroll | ns per edge-row |
    |---|---|
    | 1 (round-1 kernel) | 20.6 |
    | 4                  | 18.6 |
    | 8                  | 17.9 |

Unrolling 8x buys only ~13%: the row access is ISSUE-bound (each row's
address depends on an SMEM index load the scalar core cannot pipeline
past), not loop-overhead-bound. This is the same floor the XLA
sorted-scatter path sits on, and it repeats per propagation step, so
multi-step VMEM fusion cannot amortize it — the conclusion recorded in
benchmarks/README.md ("the edge-list aggregation question is CLOSED"):
to go faster, touch fewer rows (type-combined lanes, occupancy) or
reformulate block-dense (the `blocked` variant).

Round-5 rerun from this checked-in harness (2026-08-20, one v5e,
current jax/libtpu): 12.1 / 11.3 / 12.3 ns/row at unroll 1/4/8 — the
toolchain since round 2 lowered the absolute floor ~35%, but the SHAPE
that carries the conclusion is unchanged: unrolling is flat-to-noise,
i.e. the per-row cost is issue latency, not loop overhead.

Usage: python benchmarks/probes/gather_floor.py   (on a TPU chip)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

H = 128        # MXU-aligned row width (f32)
KE = 96        # rows gathered per block (the ELL slot count probed)
NB = 2048      # blocks per kernel call
NP = 8192      # node-state rows resident in VMEM (8192*128*4 = 4 MiB)


def _gather_kernel(src_ref, h_ref, out_ref, *, ell_k, unroll):
    """Gather ell_k rows of h into out, `unroll` rows per loop body."""
    import jax

    def body(k, _):
        base = k * unroll
        for u in range(unroll):
            out_ref[0, base + u, :] = h_ref[src_ref[0, base + u, 0], :]
        return 0

    jax.lax.fori_loop(0, ell_k // unroll, body, 0)


def make_gather(unroll):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_gather_kernel, ell_k=KE, unroll=unroll)

    def gather(h, src):
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, KE, 1), lambda nb: (nb, 0, 0),
                             memory_space=pltpu.SMEM),  # [1, KE, 1] block
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full node table
            ],
            out_specs=pl.BlockSpec((1, KE, H), lambda nb: (nb, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NB, KE, H), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(src[:, :, None], h)

    return gather


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"# platform: {jax.default_backend()}; "
          f"{NB} blocks x {KE} rows x H={H} f32, node table {NP} rows "
          f"(VMEM-resident)", file=sys.stderr)

    rng = np.random.RandomState(0)
    h = jax.device_put(rng.randn(NP, H).astype(np.float32))
    src = jax.device_put(
        rng.randint(0, NP, size=(NB, KE)).astype(np.int32))
    rows_per_call = NB * KE

    for unroll in (1, 4, 8):
        gather = make_gather(unroll)

        @jax.jit
        def chained(h, src, n):
            def body(i, acc):
                # The tiny acc-dependent perturbation defeats CSE of the
                # otherwise-identical custom calls across iterations; a
                # 4 MiB elementwise add costs ~10 us against the ~3.5 ms
                # gather and cancels in the unroll comparison anyway.
                out = gather(h + acc * 1e-30, src)
                return out[0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(chained(h, src, 1))  # compile + warm
        t0 = time.time()
        float(chained(h, src, 2))
        t1 = time.time()
        n2 = max(8, int(np.ceil(3.0 / max((t1 - t0) / 2, 1e-5))))
        float(chained(h, src, 2 + n2))
        t2 = time.time()
        per_call = ((t2 - t1) - (t1 - t0)) / n2
        print(f"unroll {unroll}: {per_call * 1e3:.3f} ms/call = "
              f"{per_call / rows_per_call * 1e9:.1f} ns/row")


if __name__ == "__main__":
    main()
