"""Serving-daemon CLI tests (split from test_cli.py for chunk balance:
the two serve tests cost ~4:30 of the 1-core suite)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from tests.test_cli import _plain, _write_tiny_config  # noqa: E402,F401


@pytest.mark.slow
def test_serve_http_roundtrip(tmp_path):
    """tools/serve.py end to end: engine warmup, micro-batcher, HTTP API."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from tests.test_composite import _has_bpe
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")

    cfg_path = tmp_path / "tiny.yaml"
    _write_tiny_config(str(cfg_path))

    import serve

    args = serve.get_args(["--config_file", str(cfg_path), "--ckpt", "random",
                           "--batch", "2", "--max_wait_ms", "5"])
    engine = serve.Engine(args)

    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(engine))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch"] == 2

        def post(caption):
            body = json.dumps({"caption": caption, "format": "mel"}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                assert r.headers["Content-Type"] == "application/octet-stream"
                return np.load(io.BytesIO(r.read()))

        # two concurrent callers -> exercises the micro-batcher's linger path
        results = {}

        def worker(name, cap):
            results[name] = post(cap)

        ts = [threading.Thread(target=worker, args=(i, c))
              for i, c in enumerate(["a dog barks", "rain falls"])]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert set(results) == {0, 1}
        for spec in results.values():
            assert spec.shape == (4, 16) and np.isfinite(spec).all()

        # bad request paths
        req = urllib.request.Request(f"http://127.0.0.1:{port}/generate",
                                     data=b"{}",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_serve_engine_int8_sharded(tmp_path):
    """serve.Engine --int8 on the 8-device virtual mesh takes the shard_map
    data-parallel path end to end."""
    from tests.test_composite import _has_bpe
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg_path = tmp_path / "tiny.yaml"
    _write_tiny_config(str(cfg_path))

    import serve

    args = serve.get_args(["--config_file", str(cfg_path), "--ckpt", "random",
                           "--int8", "--batch", "8", "--max_wait_ms", "5"])
    engine = serve.Engine(args)
    spec = engine.generate("a dog barks")
    assert spec.shape == (4, 16) and np.isfinite(spec).all()
