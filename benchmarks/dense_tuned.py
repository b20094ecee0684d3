"""Tuned dense-GGNN throughput: larger batch + bf16 MXU matmuls.

The headline bench.py keeps the reference's exact default config
(batch 256, f32); this measures how far the same model goes when tuned
for the hardware. Run from anywhere: python benchmarks/dense_tuned.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from bench import run_bench

run_bench(jax, overrides={"batch_size": 1024,
                          "compute_dtype": "bfloat16"})
