"""Serving: low-latency prediction endpoint over a checkpointed model.

The reference stops at a library API (SURVEY §1: "no CLI, no serving
layer"); production deployment needs stable-latency prediction without
recompiles. This module provides:

* :class:`Predictor` — wraps a fitted model; pads incoming test batches to
  a small set of size classes (powers of two) so every request shape hits
  an already-compiled program, and warms those programs up front.
* an HTTP JSON endpoint (stdlib ``http.server``; zero extra deps):
  ``python -m deepstructuredmixtures_tpu.serve --checkpoint m.npz --port 8000``
  then ``POST /predict {"x": [[...], ...]}`` → ``{"mean": [...], "var": [...]}``,
  plus ``GET /healthz`` and ``GET /info`` (model class, leaves, hypers).
  ``{"x": ..., "variance": false}`` returns the mean alone — on models too
  large to cache factors this takes the exact cached-alpha O(n·t) fast
  path instead of a full streamed refactorization per request.

Single-process, single-device by design — one Predictor per accelerator;
scale horizontally behind any load balancer. Batches stream through the
same jitted programs the benchmark uses.
"""
from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

from .config import as_2d


def _pow2_pad(t: int, floor: int = 16) -> int:
    return max(floor, 1 << (t - 1).bit_length())


class Predictor:
    """Compile-once, serve-many wrapper around ``model.predict``.

    ``warm_sizes``: test-batch size classes (rows) to pre-compile; incoming
    requests are padded up to the nearest class (and the padding stripped
    from the response), so request latency never includes XLA compilation.

    ``store`` / ``factor_budget``: with the default ``store='auto'``,
    construction MUTATES the passed ``model`` as a side effect — it
    refits with a BUDGETED per-bucket factor cache
    (``model.fit(store='hybrid', factor_budget=...)``): the largest
    buckets' factors persist (greedy by FLOPs saved per byte — an
    [n, n] factor avoids an n³/3 refactorization per request, so payoff
    per cached byte grows with n) and the rest stream, which other
    holders of the same model object will observe. ``store='full'``
    forces the monolithic all-leaves cache; ``store='hybrid'`` forces
    the budgeted cache even when a posterior already exists; pass
    ``store='light'`` to leave the model's posterior untouched (requests
    then stream a full refit each time).
    """

    #: default serving memory budget for cached factors — more generous
    #: than the training-time 2 GiB streaming default: serving is
    #: latency-critical and the factor cache turns every request from a
    #: full streamed refit (O(Σn³) per request) into a routed solve
    #: (O(Σn²t)). Measured on a v5e, N=20k / 144-expert model, default
    #: warm classes: p50 120 ms / p99 135 ms — at that scale the routed
    #: solve dominates both paths, and the cache's advantage grows with
    #: model size (the N=100k streamed refit alone is ~1.6 s/request).
    FACTOR_BUDGET = 8 << 30

    def __init__(self, model, warm_sizes=(16, 32, 64, 128, 256),
                 warm: bool = True, store: str = "auto",
                 factor_budget: int = FACTOR_BUDGET):
        self.model = model
        self.warm_max = max(warm_sizes)
        self.dim = int(model.plan.dim)
        self._lb = np.asarray(model.X).min(axis=0)
        self._ub = np.asarray(model.X).max(axis=0)
        self._lock = threading.Lock()  # jax dispatch is not thread-safe here
        if store == "full":
            # monolithic [L, Nmax, Nmax] cache (refit only if the model
            # has no cached factors yet); chunk the factorization so the
            # fit WORKSPACE stays bounded even when the factor cache
            # itself is several GiB
            if model.posterior is None or model.posterior.chol is None:
                from .fit import default_chunk

                model.fit(store="full",
                          chunk=default_chunk(model.plan.nmax, model.dtype))
        elif store == "hybrid" or (store == "auto" and (
            model.posterior is None or model.posterior.chol is None
        )):
            # budgeted per-bucket cache; skip the refit when the budget
            # admits nothing AND a posterior already exists (the old
            # streamed behaviour, minus a pointless refit)
            would = model._hybrid_cached_flags(factor_budget)
            if (store == "hybrid" or any(would)
                    or model.posterior is None):
                model.fit(store="hybrid", factor_budget=factor_budget)
        if warm:
            model._ensure_posterior()
            # Warm with points SPREAD over the training box: the routed
            # pad (tmax) depends on where the points land, and uniformly
            # spread batches produce the routing density of typical
            # requests. Degenerate batches (everything in one region)
            # compile their own pow-2 tmax variant on first encounter.
            rng = np.random.default_rng(0)
            for t in warm_sizes:
                xw = rng.uniform(self._lb, self._ub, (t, self.dim))
                self._predict_padded(xw)
                if self._mean_only:  # also warm the mean fast path
                    self._predict_padded(xw, return_var=False)

    def _predict_padded(self, x, return_var: bool = True):
        T = x.shape[0]
        if T > self.warm_max:
            # Requests past the largest warmed size class run in warmed-size
            # chunks: latency stays bounded by already-compiled programs and
            # one oversized body cannot trigger an unbounded pad + compile
            # while holding the predictor lock. Per-point predictions are
            # independent, so chunking is exact.
            means, vars_ = [], []
            for s in range(0, T, self.warm_max):
                m, v = self._predict_padded(x[s : s + self.warm_max],
                                            return_var)
                means.append(m)
                vars_.append(v)
            return (np.concatenate(means),
                    np.concatenate(vars_) if return_var else None)
        Tp = _pow2_pad(T)
        if Tp != T:
            # pad with points SPREAD over the training box (not repeats of
            # one row): the routed-predict pad tmax tracks the densest
            # leaf, and a clump of identical padding points would inflate
            # it past the warmed variants, forcing a recompile.
            frac = (np.arange(Tp - T) + 0.5) / (Tp - T)
            fill = self._lb + frac[:, None] * (self._ub - self._lb)
            x = np.concatenate([x, fill], axis=0)
        if not return_var and self._mean_only:
            # light-store model with the alpha cache: exact O(n·t) mean —
            # no O(n³) refactorization stream per request
            mean = self.model.predict(x, return_var=False)
            return np.asarray(mean)[:T], None
        mean, var = self.model.predict(x)
        mean, var = np.asarray(mean)[:T], np.asarray(var)[:T]
        return (mean, var) if return_var else (mean, None)

    @property
    def _mean_only(self) -> bool:
        m = self.model
        try:
            import inspect

            has_rv = "return_var" in inspect.signature(m.predict).parameters
        except (TypeError, ValueError):  # builtins / C wrappers
            has_rv = False
        return (getattr(m, "_alpha_cache", None) is not None
                and m.posterior is not None and m.posterior.chol is None
                and not getattr(m, "_giant", None)
                and has_rv)

    def _validate(self, x) -> np.ndarray:
        x = as_2d(np.asarray(x, dtype=np.float64))
        if x.shape[1] != self.dim:
            raise ValueError(
                f"expected {self.dim}-dimensional inputs, got {x.shape[1]}"
            )
        if not np.all(np.isfinite(x)):
            raise ValueError("non-finite prediction inputs")
        return x

    def predict(self, x, return_var: bool = True):
        """``x [T, D]`` (or [T] for 1-D models) → ``(mean [T], var [T])``.
        ``return_var=False`` skips the variance (``var`` comes back
        ``None``); on light-store models this takes the cached-alpha
        mean fast path — the memory-budget case where per-request
        latency otherwise pays a full streamed refactorization."""
        x = self._validate(x)
        with self._lock:
            t0 = time.perf_counter()
            mean, var = self._predict_padded(x, return_var)
            dt = time.perf_counter() - t0
        return mean, var, dt

    def info(self) -> dict:
        m = self.model
        return {
            "class": type(m).__name__,
            "num_leaves": int(m.num_leaves),
            "dim": self.dim,
            "dtype": str(np.dtype(m.dtype)),
            "theta": np.asarray(m.theta).tolist(),
            "num_mixtures": int(m.num_mixtures()),
        }


class _Pending:
    __slots__ = ("x", "want_var", "event", "mean", "var", "error",
                 "latency_s", "batched_with")

    def __init__(self, x, want_var):
        self.x = x
        self.want_var = want_var
        self.event = threading.Event()
        self.mean = self.var = self.error = None
        self.latency_s = 0.0
        self.batched_with = 1


class MicroBatcher:
    """Coalesce concurrent predict requests into one routed predict.

    Under concurrency, requests serialize behind the predictor lock and
    each pays the full per-request cost. At headline scale that cost is
    dominated by the UNCACHED buckets' refactorization stream, which is
    REQUEST-INDEPENDENT — O(Σn³) whether 16 or 2000 test points ride the
    program (measured: 1.11 s/request at N=100k under the 8 GiB hybrid
    cache, BASELINE.md round-4 serving section). Per-point predictions
    are independent (routing is per point, reference `common.jl:101-122`),
    so concatenating requests and splitting the result rows is exact.
    Coalescing R concurrent requests therefore serves all R at roughly
    the latency of one — throughput ×R where the classic serving answer
    (more replicas) would need R accelerators.

    A worker thread drains the queue: the first item opens a batch, then
    up to ``max_wait_ms`` is spent collecting more (bounded by
    ``max_batch_points`` total rows — past the largest warmed size class
    the predictor chunks exactly anyway). Mean-only and variance
    requests coalesce separately (they run different programs).
    Single-stream traffic pays at most ``max_wait_ms`` extra latency.
    """

    def __init__(self, predictor: Predictor, max_batch_points: int = 1024,
                 max_wait_ms: float = 5.0, request_timeout_s: float = 600.0):
        import queue

        self.pred = predictor
        self.max_batch_points = int(max_batch_points)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.request_timeout_s = float(request_timeout_s)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._held = None  # item deferred by the strict row cap
        self._stop = False
        self.stats = {"requests": 0, "batches": 0, "batched_points": 0}
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # drop-in for Predictor.predict (the HTTP handler calls either)
    def predict(self, x, return_var: bool = True):
        # validate in the CALLING thread so malformed requests raise
        # ValueError to their own caller (HTTP 400), never poison a batch
        x = self.pred._validate(x)
        item = _Pending(x, bool(return_var))
        t0 = time.perf_counter()
        self._q.put(item)
        # a bounded wait so a dead/hung worker thread surfaces as an error
        # in the requester instead of a silent forever-hang (the timeout
        # must cover a first-encounter pad-class compile; warmed classes
        # answer in milliseconds-to-seconds)
        if not item.event.wait(timeout=self.request_timeout_s):
            raise TimeoutError(
                f"prediction not served within {self.request_timeout_s} s "
                "(worker thread dead or batch stuck in compilation)"
            )
        if item.error is not None:
            raise item.error
        item.latency_s = time.perf_counter() - t0
        return item.mean, item.var, item.latency_s

    def info(self) -> dict:
        return self.pred.info()

    def close(self):
        import queue

        self._stop = True
        self._worker.join(timeout=5)
        # fail pending waiters fast: requests enqueued but never collected
        # would otherwise block their callers for the full
        # request_timeout_s before erroring (ADVICE r4)
        err = RuntimeError("MicroBatcher closed before request was served")
        if self._held is not None:
            self._held.error = err
            self._held.event.set()
            self._held = None
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            item.error = err
            item.event.set()

    def _collect(self, first: "_Pending"):
        import queue

        batch, rows = [first], first.x.shape[0]
        deadline = time.perf_counter() + self.max_wait_s
        while rows < self.max_batch_points:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if rows + item.x.shape[0] > self.max_batch_points:
                # strict row bound: hold the overflowing item — it opens
                # the next batch instead of stretching this one
                self._held = item
                break
            batch.append(item)
            rows += item.x.shape[0]
        return batch

    def _loop(self):
        import queue

        while not self._stop:
            if self._held is not None:
                first, self._held = self._held, None
            else:
                try:
                    first = self._q.get(timeout=0.1)
                except queue.Empty:
                    continue
            batch = self._collect(first)
            for want_var in (True, False):
                group = [it for it in batch if it.want_var == want_var]
                if not group:
                    continue
                # the WHOLE per-group body is guarded: a failure anywhere
                # (concatenation MemoryError, device error, result
                # slicing) is delivered to every waiter — a single bad
                # batch must never kill the worker thread (ADVICE r4)
                try:
                    xs = np.concatenate([it.x for it in group], axis=0)
                    mean, var, _ = self.pred.predict(xs, return_var=want_var)
                    self.stats["requests"] += len(group)
                    self.stats["batches"] += 1
                    self.stats["batched_points"] += int(xs.shape[0])
                    off = 0
                    for it in group:
                        t = it.x.shape[0]
                        it.mean = mean[off:off + t]
                        it.var = var[off:off + t] if want_var else None
                        it.batched_with = len(group)
                        it.event.set()
                        off += t
                except Exception as e:  # deliver to every waiter
                    for it in group:
                        if not it.event.is_set():
                            it.error = e
                            it.event.set()


#: default request-body cap (bytes); ~16 MiB ≈ 500k float literals — far
#: beyond any sane prediction batch, small enough to bound allocation.
MAX_BODY_BYTES = 16 << 20


def make_handler(predictor: Predictor, max_body_bytes: int = MAX_BODY_BYTES):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/info":
                self._send(200, predictor.info())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    self._send(413, {
                        "error": f"request body {n} bytes exceeds limit "
                                 f"{max_body_bytes}"
                    })
                    return
                req = json.loads(self.rfile.read(n))
                want_var = bool(req.get("variance", True))
                mean, var, dt = predictor.predict(
                    np.asarray(req["x"]), return_var=want_var
                )
                out = {"mean": mean.tolist(), "latency_s": dt}
                if want_var:
                    out["var"] = var.tolist()
                self._send(200, out)
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except TimeoutError as e:
                # MicroBatcher.predict timed out (worker dead or batch
                # stuck in compilation): a structured 504 beats a dropped
                # connection (ADVICE r4)
                self._send(504, {"error": str(e)})
            except Exception as e:
                # batched-path failures arrive via item.error and can be
                # any exception type (device/runtime errors hit every
                # coalesced waiter) — return a structured 500
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(predictor: Predictor, host: str = "127.0.0.1", port: int = 8000,
          max_body_bytes: int = MAX_BODY_BYTES):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        (host, port), make_handler(predictor, max_body_bytes)
    )
    return server


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-body-bytes", type=int, default=MAX_BODY_BYTES)
    ap.add_argument("--no-batching", action="store_true",
                    help="serialize requests behind the predictor lock "
                         "instead of micro-batching concurrent ones")
    ap.add_argument("--batch-window-ms", type=float, default=5.0,
                    help="micro-batch collection window (worst-case added "
                         "latency for single-stream traffic)")
    ap.add_argument("--request-timeout-s", type=float, default=600.0,
                    help="bound on a coalesced request's wait (must cover "
                         "a first-encounter pad-class compile; timed-out "
                         "requests get HTTP 504)")
    ap.add_argument("--max-batch-points", type=int, default=1024,
                    help="strict cap on total rows per coalesced batch")
    args = ap.parse_args(argv)

    from . import checkpoint

    model = checkpoint.load(args.checkpoint)
    pred = Predictor(model)
    if not args.no_batching:
        pred = MicroBatcher(pred, max_wait_ms=args.batch_window_ms,
                            request_timeout_s=args.request_timeout_s,
                            max_batch_points=args.max_batch_points)
    server = serve(pred, args.host, args.port, args.max_body_bytes)
    print(f"serving {type(model).__name__} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
