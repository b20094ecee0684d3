"""HTTP serving load benchmark: latency/throughput under concurrency,
coalescing vs serialized dispatch (round-5 VERDICT item #4).

Starts a real PredictionServer (sparse Predictor, 2048-node envelope,
random weights — serving cost does not depend on weight values) and
drives it with N concurrent HTTP clients, each issuing sequential
single-graph /predict requests from a fixed pool of QM9-shaped
molecules for a fixed duration. Reports p50/p99 request latency and
aggregate requests/s for N in {1, 4, 16}, with request coalescing ON
(the default: whichever thread wins the device lock drains the queue
into one merged device call) and OFF (the pre-round-5 serialized lock,
`PredictionServer(..., coalesce=False)`).

Usage: python benchmarks/load.py [--duration S] [--clients 1,4,16]
"""
import argparse
import json as _json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_predictor():
    import jax
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.serving import Predictor
    from ggnn_tpu.training.config import default_params_for

    cfg = default_params_for("sparse")
    data = synthetic_molecules(64, seed=0)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    model = SparseGGNN(cfg, meta.num_edge_types)
    key = jax.random.PRNGKey(0)
    params = {"graph": model.init_params(key),
              "heads": init_output_heads(key, cfg["hidden_size"],
                                         cfg["task_ids"])}
    return Predictor("sparse", cfg, meta, {"params": params}), data


def drive(base: str, pool, n_clients: int, duration: float):
    """n_clients threads of sequential single-graph requests; returns
    (latencies_s, total_requests, wall_s)."""
    latencies = [[] for _ in range(n_clients)]
    errors = []
    stop_at = [0.0]
    start = threading.Barrier(n_clients + 1)

    def client(ci):
        rng = np.random.RandomState(ci)
        start.wait(timeout=60)
        while time.time() < stop_at[0]:
            g = pool[rng.randint(len(pool))]
            body = _json.dumps({"graphs": [g]}).encode()
            t0 = time.time()
            try:
                req = urllib.request.Request(
                    f"{base}/predict", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    _json.load(r)
            except Exception as exc:
                errors.append(exc)
                return
            latencies[ci].append(time.time() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    # Set the deadline BEFORE releasing the barrier — clients read it
    # immediately after the barrier drops.
    t_begin = time.time()
    stop_at[0] = t_begin + duration
    start.wait(timeout=60)
    for t in threads:
        t.join(timeout=duration + 120)
    if any(t.is_alive() for t in threads):
        raise RuntimeError(
            "client thread(s) still running past the join timeout — "
            "refusing to compute stats from a list under mutation")
    wall = time.time() - t_begin
    if errors:
        raise errors[0]
    flat = sorted(x for l in latencies for x in l)
    if not flat:
        raise RuntimeError(
            f"no requests completed within --duration={duration}s "
            "(raise it; each request must finish inside the window)")
    return flat, len(flat), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--clients", default="1,4,16")
    args = ap.parse_args()
    client_counts = [int(x) for x in args.clients.split(",")]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ggnn_tpu.server import PredictionServer

    predictor, pool = build_predictor()
    print(f"# platform: {jax.default_backend()}; sparse Predictor, "
          f"single-graph requests from a {len(pool)}-molecule pool, "
          f"{args.duration:.0f}s per cell", file=sys.stderr)
    print(f"{'coalesce':>9} {'clients':>8} {'req/s':>8} {'p50 ms':>8} "
          f"{'p99 ms':>8} {'device calls':>13} {'merged reqs':>12}")
    for coalesce in (False, True):
        server = PredictionServer(predictor, port=0, coalesce=coalesce)
        server.warmup()
        server.start()
        host, port = server.address
        base = f"http://{host}:{port}"
        try:
            for n in client_counts:
                if server._dispatcher is not None:
                    server._dispatcher.device_calls = 0
                    server._dispatcher.coalesced_requests = 0
                lat, total, wall = drive(base, pool, n, args.duration)
                p50 = lat[len(lat) // 2] * 1e3
                p99 = lat[int(len(lat) * 0.99)] * 1e3
                calls = merged = "-"
                if server._dispatcher is not None:
                    calls = server._dispatcher.device_calls
                    merged = server._dispatcher.coalesced_requests
                print(f"{str(coalesce):>9} {n:>8} {total / wall:>8.1f} "
                      f"{p50:>8.2f} {p99:>8.2f} {calls:>13} {merged:>12}")
        finally:
            server.shutdown()


if __name__ == "__main__":
    main()
