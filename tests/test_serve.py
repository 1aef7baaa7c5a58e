"""Serving layer: padded-shape predictor + HTTP endpoint round trip."""
import time
import json
import threading
import urllib.error
import urllib.request

import numpy as np

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.serve import MicroBatcher, Predictor, serve


def _model():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, 150)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(150)
    return dsm.build_dsmgp(x, y, V=2, K=2, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                           log_noise=-1.0, seed=1)


def test_predictor_padding_matches_direct():
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)
    xt = np.linspace(0, 1, 23).reshape(-1, 1)  # pads 23 -> 32
    mean_p, var_p, dt = p.predict(xt)
    mean_d, var_d = m.predict(xt)
    np.testing.assert_allclose(mean_p, np.asarray(mean_d), atol=1e-10)
    np.testing.assert_allclose(var_p, np.asarray(var_d), atol=1e-10)
    assert dt > 0
    # bad inputs rejected
    for bad in (np.full((3, 1), np.nan), np.zeros((3, 2))):
        try:
            p.predict(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_http_endpoint_roundtrip():
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)
    server = serve(p, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as r:
            assert json.loads(r.read())["ok"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=10
        ) as r:
            info = json.loads(r.read())
            assert info["class"] == "DSMGP" and info["dim"] == 1

        xt = np.linspace(0, 1, 9).reshape(-1, 1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"x": xt.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        mean_d, var_d = m.predict(xt)
        np.testing.assert_allclose(out["mean"], np.asarray(mean_d), atol=1e-8)
        np.testing.assert_allclose(out["var"], np.asarray(var_d), atol=1e-8)

        # malformed request -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"x": [[1, 2, 3]]}).encode(),
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_predictor_auto_caches_factors():
    """The default predictor upgrades a light-store model to the BUDGETED
    per-bucket factor cache (latency: cached routed solve vs full streamed
    refit per request) — with the default budget every bucket fits."""
    m = _model()
    m.fit(store="light")
    assert m.posterior.chol is None
    Predictor(m, warm_sizes=(16,), warm=True)  # auto store
    assert m._bucket_factors is not None
    assert all(f is not None for f in m._bucket_factors)


def test_hybrid_partial_factor_cache_parity_and_budget():
    """fit(store='hybrid', factor_budget=B): only the largest buckets'
    factors fit the budget (greedy by FLOPs-saved-per-byte ∝ n); the
    honored footprint stays ≤ B; prediction is EXACTLY the full-cache /
    streamed result either way."""
    def _model2():  # enough data for several size buckets
        rng = np.random.default_rng(3)
        x = np.sort(rng.uniform(0, 1, 1500)).reshape(-1, 1)
        y = np.sin(x[:, 0] * 7) + 0.1 * rng.standard_normal(1500)
        return dsm.build_dsmgp(x, y, V=2, K=3, M=25,
                               kernel=dsm.IsoSE(0.0, 0.0),
                               log_noise=-1.0, seed=2, do_fit=False)

    m = _model2()
    item = np.dtype(m.dtype).itemsize
    sizes = [b.num_leaves * b.nmax * b.nmax * item
             for b in m.bucket_batches]
    assert len(sizes) >= 2  # the test needs a real partition
    # budget that fits the largest bucket but not all of them
    big = max(range(len(sizes)), key=lambda k: m.bucket_batches[k].nmax)
    budget = sizes[big] + min(sizes) // 2
    m.fit(store="hybrid", factor_budget=budget)
    cached = [f is not None for f in m._bucket_factors]
    assert cached[big]
    assert not all(cached)
    spent = sum(s for s, c in zip(sizes, cached) if c)
    assert spent <= budget
    xt = np.linspace(-0.05, 1.05, 33).reshape(-1, 1)
    mean_h, var_h = m.predict(xt)

    m2 = _model2()
    m2.fit(store="full")
    mean_f, var_f = m2.predict(xt)
    np.testing.assert_allclose(np.asarray(mean_h), np.asarray(mean_f),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_h), np.asarray(var_f),
                               atol=1e-9)
    # full-budget hybrid: everything cached, same answers
    m.fit(store="hybrid")
    assert all(f is not None for f in m._bucket_factors)
    mean_a, var_a = m.predict(xt)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_f),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_f),
                               atol=1e-9)
    # PoE-family shared-test-point path through the hybrid cache
    p = _model2()  # fresh tree, same data
    p.fit(store="hybrid", factor_budget=budget)
    mu_h, vv_h = p._leaf_predict_all(np.asarray(xt, p.dtype))
    p2 = _model2()
    p2.fit(store="full")
    mu_f, vv_f = p2._leaf_predict_all(np.asarray(xt, p2.dtype))
    np.testing.assert_allclose(np.asarray(mu_h), np.asarray(mu_f),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(vv_h), np.asarray(vv_f),
                               atol=1e-9)


def test_predictor_over_streamed_light_store():
    """Serving a large model (light store: factors never persist, routed
    prediction streams per bucket) must agree with the cached-factor
    path."""
    m = _model()
    m.fit(store="light")
    assert m.posterior.chol is None  # streamed predict path active
    # factor_budget=0 keeps the predictor on the streamed path (by
    # default it upgrades to cached factors whenever they fit the budget)
    p = Predictor(m, warm_sizes=(16,), warm=True, factor_budget=0)
    assert m.posterior.chol is None
    xt = np.linspace(0, 1, 23).reshape(-1, 1)
    mean_p, var_p, _ = p.predict(xt)
    m2 = _model()
    m2.fit(store="full")
    mean_d, var_d = m2.predict(xt)
    np.testing.assert_allclose(mean_p, np.asarray(mean_d), atol=1e-9)
    np.testing.assert_allclose(var_p, np.asarray(var_d), atol=1e-9)


def test_oversized_body_rejected_and_big_batches_chunked():
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)
    server = serve(p, port=0, max_body_bytes=4096)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # body over the configured cap -> 413, predictor never touched
        big = json.dumps({"x": [[0.5]] * 2000}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=big
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected HTTP 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        server.shutdown()
    # batches past the largest warmed class run in warmed-size chunks
    # (exact: per-point predictions are independent)
    xt = np.linspace(0, 1, 53).reshape(-1, 1)  # 53 > warm_max = 16
    mean_p, var_p, _ = p.predict(xt)
    mean_d, var_d = m.predict(xt)
    np.testing.assert_allclose(mean_p, np.asarray(mean_d), atol=1e-10)
    np.testing.assert_allclose(var_p, np.asarray(var_d), atol=1e-10)



def test_mean_only_fast_path_serving():
    """variance=false requests on a light-store model take the cached-
    alpha mean fast path (no streamed refactorization) and must equal
    the full predict's mean; chunked oversized batches too."""
    m = _model()
    m.fit(store="light")
    p = Predictor(m, warm_sizes=(16,), warm=True, factor_budget=0)
    assert p._mean_only
    xt = np.linspace(0, 1, 23).reshape(-1, 1)
    mean_f, none_var, _ = p.predict(xt, return_var=False)
    assert none_var is None
    m2 = _model()
    m2.fit(store="full")
    mean_d, _ = m2.predict(xt)
    np.testing.assert_allclose(mean_f, np.asarray(mean_d), atol=1e-9)
    # oversized batch chunks through the mean-only path exactly
    xt_big = np.linspace(0, 1, 40).reshape(-1, 1)  # > warm_max 16
    mean_big, nv, _ = p.predict(xt_big, return_var=False)
    assert nv is None
    mean_ref, _ = m2.predict(xt_big)
    np.testing.assert_allclose(mean_big, np.asarray(mean_ref), atol=1e-9)

    # HTTP: {"variance": false} -> no "var" key in the response
    server = serve(p, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps(
            {"x": xt.tolist(), "variance": False}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert "var" not in out
        np.testing.assert_allclose(out["mean"], mean_f, atol=1e-7)
    finally:
        server.shutdown()

def test_microbatcher_coalesces_and_matches_direct():
    """Concurrent requests coalesce into fewer predict calls; every
    requester gets exactly its own rows of the combined routed predict
    (per-point predictions are independent, so batching is exact)."""
    m = _model()
    p = Predictor(m, warm_sizes=(16, 32), warm=True)
    mb = MicroBatcher(p, max_wait_ms=300.0)  # generous window: force
    try:                                     # coalescing deterministically
        rng = np.random.default_rng(7)
        xs = [np.sort(rng.uniform(0, 1, 5)).reshape(-1, 1)
              for _ in range(6)]
        results = [None] * 6
        barrier = threading.Barrier(6)

        def worker(i):
            barrier.wait()
            results[i] = mb.predict(xs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i in range(6):
            mean_b, var_b, dt = results[i]
            mean_d, var_d = m.predict(xs[i])
            np.testing.assert_allclose(mean_b, np.asarray(mean_d),
                                       atol=1e-10)
            np.testing.assert_allclose(var_b, np.asarray(var_d),
                                       atol=1e-10)
            assert dt > 0
        # at least some coalescing happened (6 requests arrive within one
        # 300 ms window; the first may run alone if the worker grabbed it
        # before the rest enqueued)
        assert mb.stats["requests"] == 6
        assert mb.stats["batches"] < 6
    finally:
        mb.close()


def test_microbatcher_mixed_variance_and_errors():
    """Mean-only and variance requests coalesce separately; a malformed
    request raises in ITS caller without touching the batch."""
    m = _model()
    m.fit(store="light")
    p = Predictor(m, warm_sizes=(16,), warm=True, factor_budget=0)
    assert p._mean_only
    mb = MicroBatcher(p, max_wait_ms=100.0)
    try:
        # malformed: validation raises in the calling thread, pre-queue
        try:
            mb.predict(np.zeros((3, 2)))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
        xt = np.linspace(0, 1, 9).reshape(-1, 1)
        out = {}
        barrier = threading.Barrier(2)

        def var_req():
            barrier.wait()
            out["var"] = mb.predict(xt, return_var=True)

        def mean_req():
            barrier.wait()
            out["mean"] = mb.predict(xt, return_var=False)

        ts = [threading.Thread(target=var_req),
              threading.Thread(target=mean_req)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        m2 = _model()
        m2.fit(store="full")
        mean_d, var_d = m2.predict(xt)
        np.testing.assert_allclose(out["var"][0], np.asarray(mean_d),
                                   atol=1e-9)
        np.testing.assert_allclose(out["var"][1], np.asarray(var_d),
                                   atol=1e-9)
        np.testing.assert_allclose(out["mean"][0], np.asarray(mean_d),
                                   atol=1e-9)
        assert out["mean"][1] is None
    finally:
        mb.close()


def test_http_endpoint_through_microbatcher():
    """The HTTP handler is agnostic to the batcher: same round trip."""
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)
    mb = MicroBatcher(p, max_wait_ms=2.0)
    server = serve(mb, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        xt = np.linspace(0, 1, 9).reshape(-1, 1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"x": xt.tolist()}).encode(),
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        mean_d, var_d = m.predict(xt)
        np.testing.assert_allclose(out["mean"], np.asarray(mean_d),
                                   atol=1e-8)
        np.testing.assert_allclose(out["var"], np.asarray(var_d),
                                   atol=1e-8)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=10
        ) as r:
            assert json.loads(r.read())["class"] == "DSMGP"
    finally:
        server.shutdown()
        mb.close()


def test_microbatcher_strict_row_cap_and_close_drains():
    """ADVICE r4: (a) a coalesced batch never exceeds max_batch_points —
    an overflowing item opens the NEXT batch instead of stretching this
    one; (b) close() fails queued-but-unserved requests fast instead of
    letting them hang for request_timeout_s."""
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)
    mb = MicroBatcher(p, max_wait_ms=300.0, max_batch_points=12)
    try:
        xs = [np.sort(np.random.default_rng(i).uniform(0, 1, 5)).reshape(-1, 1)
              for i in range(4)]
        results = [None] * 4
        barrier = threading.Barrier(4)

        def worker(i):
            barrier.wait()
            results[i] = mb.predict(xs[i])

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        for i in range(4):
            mean_b, _, _ = results[i]
            mean_d, _ = m.predict(xs[i])
            np.testing.assert_allclose(mean_b, np.asarray(mean_d), atol=1e-9)
            # 12-row cap: no request was served in a batch of >2 (2x5=10
            # fits, 3x5=15 does not)
            assert results[i][0].shape[0] == 5
    finally:
        mb.close()

    # close() drains: an item enqueued into a closed batcher's queue gets
    # a fast RuntimeError from close, not a request_timeout_s hang
    from deepstructuredmixtures_tpu.serve import _Pending
    mb2 = MicroBatcher(p, max_wait_ms=1.0, request_timeout_s=60.0)
    mb2._stop = True           # stop the worker from collecting
    mb2._worker.join(timeout=5)
    item = _Pending(np.zeros((2, 1)), True)
    mb2._q.put(item)
    t0 = time.perf_counter()
    mb2.close()
    assert item.event.is_set() and isinstance(item.error, RuntimeError)
    assert time.perf_counter() - t0 < 5


def test_http_batched_path_errors_are_structured():
    """ADVICE r4: TimeoutError from the batched path returns HTTP 504 and
    arbitrary worker-delivered exceptions return HTTP 500 — never a
    dropped connection."""
    m = _model()
    p = Predictor(m, warm_sizes=(16,), warm=True)

    class Timesout:
        def predict(self, x, return_var=True):
            raise TimeoutError("prediction not served within 0.1 s")

        def info(self):
            return p.info()

    class Explodes:
        def predict(self, x, return_var=True):
            raise RuntimeError("device lost")

        def info(self):
            return p.info()

    for impl, code in ((Timesout(), 504), (Explodes(), 500)):
        server = serve(impl, port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=json.dumps({"x": [[0.5]]}).encode(),
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == code
                out = json.loads(e.read())
                assert "error" in out
        finally:
            server.shutdown()


def test_serve_main_exposes_timeout_flags():
    """ADVICE r4: operators can tune the micro-batcher bounds from the
    CLI."""
    import inspect

    from deepstructuredmixtures_tpu import serve as servemod

    src = inspect.getsource(servemod.main)
    assert "--request-timeout-s" in src
    assert "--max-batch-points" in src
    assert "request_timeout_s=args.request_timeout_s" in src
    assert "max_batch_points=args.max_batch_points" in src
