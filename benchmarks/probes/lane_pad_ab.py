"""Lane-padding A/B on the headline dense bench (round-5 VERDICT item
#3: the round-4 decisive A/B, previously run ad hoc).

`lane_pad` (ops/lanes.py) zero-pads node states and the per-type/cell
weights to the next 128-lane multiple INSIDE the forward — parameters
stay at the reference shapes, numerics are exactly preserved (pad lanes
are provably zero through the GRU; pinned at ~5e-7/6e-6 forward/grad by
tests/test_models.py::test_lane_padding_matches_unpadded). Recorded
round-4 A/B (one v5e, identical corpus/shapes/compile-cache,
2026-08-20, benchmarks/README.md "Round-4"):

    | lane_pad | epoch (ms) | graphs/s | of f32 MXU rate |
    |---|---|---|---|
    | off | 39.83 | 636,297 | 65.1% |
    | on  | 36.73 | 689,959 (102x) | 70.6% |

The +8.4% is under the naive +22% lane-ratio bound because the A @ h
contraction's K is the bucket size (V <= 32), untouched by feature-lane
padding, and carries ~40% of the step's MXU cycles.

This probe reruns the full headline bench (bench.py, same methodology)
twice — lane_pad forced off, then on — and prints both JSON lines plus
the ratio.

Usage: python benchmarks/probes/lane_pad_ab.py [--smoke]   (on a TPU)
"""
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import jax
    import bench
    bench._enable_compile_cache(jax)
    smoke = "--smoke" in sys.argv

    results = {}
    for mode in (False, True):
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench.run_bench(jax, smoke=smoke,
                            overrides={"lane_pad": mode})
        line = json.loads(buf.getvalue().strip().splitlines()[-1])
        results[mode] = line["value"]
        print(f"lane_pad={mode}: {line['value']:,.0f} graphs/s "
              f"({line['vs_baseline']}x reference)")
    ratio = results[True] / results[False]
    print(f"lane_pad on/off: {ratio:.3f}x "
          f"(round-4 recorded: 689,959/636,297 = 1.084x)")


if __name__ == "__main__":
    main()
