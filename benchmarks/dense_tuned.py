"""Dense-GGNN tuning grid: batch size x compute dtype.

The headline bench.py keeps the reference's exact default config
(batch 256, f32); this sweeps the two tuning knobs on top of the
round-4 128-lane compute layout. Round-4 measurements (one v5e,
25.6k-molecule corpus, same methodology as bench.py):

    batch 128  f32   690,115 graphs/s
    batch 256  f32   690,323 graphs/s   <- the default IS the plateau
    batch 512  f32   616,655
    batch 1024 f32   381,276
    batch 256  bf16  650,981
    batch 1024 bf16  381,583

Post-lane-padding conclusions: (1) the reference default batch sits ON
the throughput plateau — larger batches regress (the step is
latency/elementwise-residue-bound, not MXU-starved, so bigger [B,T,V,V]
adjacency slabs only add HBM traffic); (2) bf16 does not pay at
H=100/V<=32 — the GEMMs are too small for the MXU's bf16 rate to
matter and the step is not bandwidth-bound on the activations (the
bf16-1024 epoch time is identical to f32-1024 to 0.1%). Earlier rounds
tuned to bf16+1024 when the unpadded layout was relayout-bound; the
128-lane layout removed that bottleneck and with it the tuning
headroom. Run this file to re-measure the grid.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from bench import run_bench

for overrides in ({"batch_size": 128},
                  {"batch_size": 256},
                  {"batch_size": 512},
                  {"batch_size": 1024},
                  {"batch_size": 256, "compute_dtype": "bfloat16"},
                  {"batch_size": 1024, "compute_dtype": "bfloat16"}):
    print(f"--- overrides: {overrides}", file=sys.stderr, flush=True)
    run_bench(jax, overrides=overrides)
