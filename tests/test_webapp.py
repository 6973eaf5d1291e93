"""Webapp HTTP flow: load → t2v → continue_from_last → i2v upload → refine,
with memory_optimization host-offload on (reference webapp_single_gpu.py
endpoints :1374-1476, session LAST :872-876, CPU⇄GPU shuttle :601-608)."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=60) as r:
        return json.loads(r.read())


def _wait_done(port, timeout=600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = _get(port, "/api/status")
        if st["status"] in ("done", "error"):
            return st
        time.sleep(1.0)
    raise TimeoutError("generation did not finish")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from yume_tpu.serving import webapp

    out = tmp_path_factory.mktemp("web_out")
    args = webapp.build_argparser().parse_args(
        ["--smoke", "--memory_optimization", "--output_dir", str(out)])
    webapp.Handler.args = args
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webapp.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield port
    srv.shutdown()


def _png_b64():
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_full_session_flow(server):
    port = server
    r = _post(port, "/api/load", {})
    assert r["status"] == "loaded"

    # refuse generation conflicts is covered implicitly by the lock; t2v:
    r = _post(port, "/api/generate_long",
              {"mode": "t2v", "keys": "W", "mouse": "·", "steps": 2})
    assert r["status"] == "started"
    st = _wait_done(port)
    assert st["status"] == "done", st
    assert len(st["outputs"]) == 1
    assert st["has_session"] is True

    # continue_from_last reuses the session latents
    r = _post(port, "/api/generate_long",
              {"mode": "continue_from_last", "keys": "D", "mouse": "→",
               "steps": 2})
    st = _wait_done(port)
    assert st["status"] == "done", st
    assert len(st["outputs"]) == 2
    # per-step progress was exposed
    assert st["step"]["n"] == 2 and st["step"]["segment"] >= 1

    # i2v upload flow
    r = _post(port, "/api/generate_long",
              {"mode": "i2v", "image_b64": _png_b64(), "prompt":
               "Person moves forward (W).Camera remains still (·).",
               "steps": 2})
    st = _wait_done(port)
    assert st["status"] == "done", st
    assert len(st["outputs"]) == 3

    # multi-segment request (long generation in one call)
    r = _post(port, "/api/generate_long",
              {"mode": "continue_from_last", "steps": 2, "segments": 2})
    st = _wait_done(port)
    assert st["status"] == "done", st
    assert len(st["outputs"]) == 5

    # video download endpoint
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/video/0", timeout=60) as vr:
        assert vr.headers["Content-Type"] == "video/mp4"
        assert len(vr.read()) > 0

    # log tail endpoint
    logs = _get(port, "/api/log/tail")
    assert isinstance(logs["lines"], list)


def test_refine_endpoint(server):
    port = server
    r = _post(port, "/api/refine_prompt",
              {"prompt": "Person moves forward (W).", "image_b64": _png_b64()})
    assert "first-person view" in r["prompt"] or "(W)" in r["prompt"]


def test_index_ui_bilingual(server):
    """The embedded single-page UI must ship both language dictionaries and
    hit every live endpoint (≙ reference bilingual HTML/JS app,
    webapp_single_gpu.py:888-1373)."""
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/",
                                timeout=60) as r:
        html = r.read().decode()
    for marker in ("I18N", "交互式世界生成", "interactive world generation",
                   "/api/generate_long", "/api/refine_prompt",
                   "/api/log/tail", "/api/status", "continue_from_last",
                   "image_b64"):
        assert marker in html, marker
