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

    def predict(self, x, return_var: bool = True):
        """``x [T, D]`` (or [T] for 1-D models) → ``(mean [T], var [T])``.
        ``return_var=False`` skips the variance (``var`` comes back
        ``None``); on light-store models this takes the cached-alpha
        mean fast path — the memory-budget case where per-request
        latency otherwise pays a full streamed refactorization."""
        x = as_2d(np.asarray(x, dtype=np.float64))
        if x.shape[1] != self.dim:
            raise ValueError(
                f"expected {self.dim}-dimensional inputs, got {x.shape[1]}"
            )
        if not np.all(np.isfinite(x)):
            raise ValueError("non-finite prediction inputs")
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
    args = ap.parse_args(argv)

    from . import checkpoint

    model = checkpoint.load(args.checkpoint)
    pred = Predictor(model)
    server = serve(pred, args.host, args.port, args.max_body_bytes)
    print(f"serving {type(model).__name__} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
