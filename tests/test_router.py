"""C++ router tests: policies, worker management, metrics, traces.

Reference analog: sgl-router/tests/ + py_test/ — boot router with fake
workers and exercise routing behavior.
"""

import json
import socket
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from sglang_custom_tpu.router import launch_router


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class FakeWorker:
    """Counts requests; echoes a generate-style response."""

    def __init__(self):
        self.port = _free_port()
        self.count = 0
        worker = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                worker.count += 1
                resp = json.dumps({
                    "text": "ok",
                    "worker_port": worker.port,
                    "echo": json.loads(body or b"{}").get("text", ""),
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

            def do_GET(self):
                if self.path == "/health":
                    resp = b'{"status": "ok"}'
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(resp)))
                    self.end_headers()
                    self.wfile.write(resp)
                    return
                self.do_POST()

            def log_message(self, *a):
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        self.httpd.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def _get(url, raw=False):
    with urllib.request.urlopen(url, timeout=10) as r:
        data = r.read()
        return r.status, (data.decode() if raw else json.loads(data))


@pytest.fixture()
def cluster():
    workers = [FakeWorker() for _ in range(3)]
    handle = launch_router(
        _free_port(), [w.url for w in workers], policy="round_robin"
    )
    yield handle, workers
    handle.shutdown()
    for w in workers:
        w.stop()


def test_round_robin_balances(cluster):
    handle, workers = cluster
    for i in range(9):
        status, out = _post(handle.base_url + "/generate", {"text": f"req{i}"})
        assert status == 200 and out["text"] == "ok"
    assert [w.count for w in workers] == [3, 3, 3]


def test_worker_management(cluster):
    handle, workers = cluster
    status, out = _get(handle.base_url + "/list_workers")
    assert status == 200 and len(out["urls"]) == 3

    _post(handle.base_url + "/remove_worker", {"url": workers[0].url})
    status, out = _get(handle.base_url + "/list_workers")
    assert len(out["urls"]) == 2

    _post(handle.base_url + "/add_worker", {"url": workers[0].url})
    status, out = _get(handle.base_url + "/list_workers")
    assert len(out["urls"]) == 3


def test_loads_metrics_traces(cluster):
    handle, workers = cluster
    for i in range(4):
        _post(handle.base_url + "/generate", {"text": "x", "rid": f"r{i}"})
    status, loads = _get(handle.base_url + "/get_loads")
    assert status == 200
    assert sum(w["total"] for w in loads["loads"]) == 4
    status, metrics = _get(handle.base_url + "/metrics", raw=True)
    assert "router_requests_total" in metrics
    assert 'router_policy_info{policy="round_robin"}' in metrics
    status, traces = _get(handle.base_url + "/request_traces")
    rids = {t["rid"] for t in traces["traces"]}
    assert {"r0", "r1", "r2", "r3"} <= rids


def test_cache_aware_affinity():
    workers = [FakeWorker() for _ in range(2)]
    handle = launch_router(
        _free_port(), [w.url for w in workers], policy="cache_aware"
    )
    try:
        # same long prefix repeatedly -> same worker
        body = {"text": "a very long shared prefix " * 10}
        targets = set()
        for _ in range(6):
            _, out = _post(handle.base_url + "/generate", body)
            targets.add(out["worker_port"])
        assert len(targets) == 1
        # a different prefix should be allowed to go elsewhere eventually
        body2 = {"text": "completely different content " * 10}
        _, out2 = _post(handle.base_url + "/generate", body2)
        assert out2["worker_port"] in [w.port for w in workers]
    finally:
        handle.shutdown()
        for w in workers:
            w.stop()


def test_fixed_probability():
    workers = [FakeWorker() for _ in range(2)]
    handle = launch_router(
        _free_port(), [w.url for w in workers],
        policy="fixed_probability", probs=[1.0, 0.0],
    )
    try:
        for i in range(8):
            _post(handle.base_url + "/generate", {"text": f"p{i}"})
        assert workers[0].count == 8 and workers[1].count == 0
    finally:
        handle.shutdown()
        for w in workers:
            w.stop()


def test_marginal_utility_smoke():
    workers = [FakeWorker() for _ in range(2)]
    handle = launch_router(
        _free_port(), [w.url for w in workers], policy="marginal_utility"
    )
    try:
        for i in range(20):
            status, _ = _post(handle.base_url + "/generate", {"text": f"m{i}"})
            assert status == 200
        assert workers[0].count + workers[1].count == 20
    finally:
        handle.shutdown()
        for w in workers:
            w.stop()


def test_no_workers_503():
    handle = launch_router(_free_port(), [], policy="random")
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            _post(handle.base_url + "/generate", {"text": "x"})
        assert e.value.code == 503
    finally:
        handle.shutdown()


def test_active_health_checks():
    """A dead worker is actively probed out of rotation and restored when
    it comes back (reference: sgl-router health-checker loop)."""
    import time

    live = FakeWorker()
    dead = FakeWorker()
    handle = launch_router(
        _free_port(), [live.url, dead.url], policy="round_robin",
        health_interval_ms=100, health_fail_threshold=2,
    )
    try:
        dead_url = dead.url
        dead.stop()  # worker dies; probes must notice within ~300ms
        dead.httpd.server_close()  # release the port for the revive below
        deadline = time.monotonic() + 5
        unhealthy = False
        while time.monotonic() < deadline:
            _, loads = _get(handle.base_url + "/get_loads")
            by_url = {l["url"]: l for l in loads["loads"]}
            if not by_url[dead_url]["healthy"]:
                unhealthy = True
                break
            time.sleep(0.05)
        assert unhealthy, "dead worker never marked unhealthy"

        # All traffic lands on the live worker; nothing 502s.
        for i in range(6):
            status, out = _post(handle.base_url + "/generate", {"text": f"h{i}"})
            assert status == 200
            assert out["worker_port"] == live.port

        # Revive on the same port: a single successful probe restores it.
        revived = FakeWorker.__new__(FakeWorker)
        revived.port = int(dead_url.rsplit(":", 1)[1])
        revived.count = 0
        import json as _json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        worker = revived

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)
                worker.count += 1
                resp = _json.dumps({"text": "ok",
                                    "worker_port": worker.port}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

            do_GET = do_POST

            def log_message(self, *a):
                pass

        revived.httpd = ThreadingHTTPServer(("127.0.0.1", revived.port), Handler)
        threading.Thread(target=revived.httpd.serve_forever, daemon=True).start()
        deadline = time.monotonic() + 5
        healthy = False
        while time.monotonic() < deadline:
            _, loads = _get(handle.base_url + "/get_loads")
            by_url = {l["url"]: l for l in loads["loads"]}
            if by_url[dead_url]["healthy"]:
                healthy = True
                break
            time.sleep(0.05)
        assert healthy, "revived worker never restored"
        revived.stop()
    finally:
        handle.shutdown()
        live.stop()


def test_pd_pairing_e2e(tiny_llama_path):
    """C++ router PD mode drives REAL prefill/decode engines end-to-end
    (reference: sgl-router/src/routers/pd_router.rs select_worker_pair +
    bootstrap-room injection; VERDICT r3 #10). The router discovers the
    decode side's KV rendezvous via /get_server_info, injects room +
    kv_host/kv_port into /pd_prefill, then streams /pd_generate back."""
    import asyncio
    import time

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine
    from sglang_custom_tpu.entrypoints.http_server import HttpServer, _run_app

    def boot(disagg_mode=None):
        args = ServerArgs(
            model_path=tiny_llama_path, dtype="float32", device="cpu",
            page_size=4, skip_tokenizer_init=True, port=_free_port(),
            disaggregation_mode=disagg_mode,
        )
        engine = Engine(server_args=args, num_pages=128)
        srv = HttpServer(engine)
        loop = asyncio.new_event_loop()
        started = threading.Event()

        def run():
            asyncio.set_event_loop(loop)
            loop.run_until_complete(_run_app(srv.app, args.host, args.port))
            started.set()
            loop.run_forever()

        th = threading.Thread(target=run, daemon=True)
        th.start()
        assert started.wait(timeout=60)
        return engine, loop, th, f"http://{args.host}:{args.port}"

    prefill_e, ploop, pth, purl = boot()
    decode_e, dloop, dth, durl = boot(disagg_mode="decode")
    handle = None
    try:
        assert decode_e.kv_receiver is not None
        prompt = [(7 * i + 3) % 400 + 2 for i in range(30)]
        sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        expected = prefill_e.generate(input_ids=prompt, sampling_params=sp)

        handle = launch_router(
            _free_port(), policy="round_robin",
            prefill_workers=[purl], decode_workers=[durl],
            health_interval_ms=0,
        )
        status, out = _post(
            handle.base_url + "/generate",
            {"input_ids": prompt, "sampling_params": sp},
        )
        assert status == 200
        assert out["output_ids"] == expected["output_ids"]

        # Prometheus text metrics cover both fleets
        _, metrics = _get(handle.base_url + "/metrics", raw=True)
        assert "router_requests_total" in metrics
        assert purl in metrics and durl in metrics
    finally:
        if handle is not None:
            handle.shutdown()
        for loop, th in ((ploop, pth), (dloop, dth)):
            loop.call_soon_threadsafe(loop.stop)
            th.join(timeout=5)
        prefill_e.shutdown()
        decode_e.shutdown()


def test_metrics_csv_recorder(tmp_path):
    """--metrics-csv writes a per-request trace CSV (reference:
    sgl-router/src/policies/marginal_utility_recorder.rs — the fork's
    router_test_*.csv experiment artifacts)."""
    import csv as _csv

    w = FakeWorker()
    path = str(tmp_path / "router_test.csv")
    handle = launch_router(
        _free_port(), [w.url], policy="round_robin",
        health_interval_ms=0, metrics_csv=path,
    )
    try:
        for i in range(5):
            _post(handle.base_url + "/generate", {"text": f"t{i}"})
        with open(path) as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 5
        assert rows[0]["worker"] == w.url
        assert rows[0]["policy"] == "round_robin"
        assert float(rows[0]["latency_s"]) >= 0.0
        assert rows[-1]["total"] == "5"
    finally:
        handle.shutdown()
        w.stop()


def test_file_service_discovery(tmp_path):
    """File-watch service discovery (reference: sgl-router
    src/service_discovery.rs — K8s pod watcher; here a JSON worker list
    an orchestrator rewrites): workers appear/disappear without restarts
    or /add_worker calls."""
    import json as _json
    import time as _t

    w1, w2 = FakeWorker(), FakeWorker()
    disc = tmp_path / "workers.json"
    disc.write_text(_json.dumps({"workers": [w1.url]}))
    handle = launch_router(
        _free_port(), policy="round_robin", health_interval_ms=0,
        discovery_file=str(disc), discovery_interval_ms=100,
    )
    try:
        _, lw = _get(handle.base_url + "/list_workers")
        assert lw["urls"] == [w1.url]

        # orchestrator scales up
        disc.write_text(_json.dumps({"workers": [w1.url, w2.url]}))
        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline:
            _, lw = _get(handle.base_url + "/list_workers")
            if set(lw["urls"]) == {w1.url, w2.url}:
                break
            _t.sleep(0.05)
        assert set(lw["urls"]) == {w1.url, w2.url}

        # scales down to only w2
        disc.write_text(_json.dumps({"workers": [w2.url]}))
        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline:
            _, lw = _get(handle.base_url + "/list_workers")
            if lw["urls"] == [w2.url]:
                break
            _t.sleep(0.05)
        assert lw["urls"] == [w2.url]
        for _ in range(3):
            _post(handle.base_url + "/generate", {"text": "x"})
        assert w2.count >= 3 and w1.count == 0
    finally:
        handle.shutdown()
        w1.stop()
        w2.stop()
