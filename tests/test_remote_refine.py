"""RemoteRefiner vs a local stub endpoint (≙ the reference's
DashScopePromptExpander contract, wan/utils/prompt_extend.py:157-290:
chat-completion call, bounded-area image inlining, retry, graceful
status=False fallback)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from yume_tpu.data.prompt_refine import RemoteRefiner


class _Stub(BaseHTTPRequestHandler):
    fail_first = 0
    seen = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(n))
        type(self).seen.append(req)
        if type(self).fail_first > 0:
            type(self).fail_first -= 1
            self.send_response(500)
            self.end_headers()
            return
        body = json.dumps({
            "choices": [{"message": {
                "content": "EXPANDED: " + str(req["messages"][1]["content"])
            }}]
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def stub():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    _Stub.fail_first = 0
    _Stub.seen = []
    yield f"http://127.0.0.1:{srv.server_address[1]}/chat"
    srv.shutdown()


def test_remote_refine_text(stub):
    r = RemoteRefiner(base_url=stub, api_key="k", model_name="m")
    out = r.extend("walk forward (W)")
    assert out.status and out.prompt.startswith("EXPANDED:")
    assert "walk forward (W)" in out.prompt
    assert _Stub.seen[0]["model"] == "m"
    assert _Stub.seen[0]["messages"][0]["role"] == "system"


def test_remote_refine_retries_then_succeeds(stub):
    _Stub.fail_first = 2
    r = RemoteRefiner(base_url=stub, retry_times=4)
    out = r.extend("pan left")
    assert out.status
    assert len(_Stub.seen) == 3  # two 500s + one success


def test_remote_refine_falls_back_on_exhausted_retries(stub):
    _Stub.fail_first = 99
    r = RemoteRefiner(base_url=stub, retry_times=2)
    out = r.extend("tilt up")
    assert not out.status
    assert out.prompt == "tilt up"  # original returned unchanged
    assert out.message  # the transport error is reported


def test_remote_refine_inlines_bounded_image(stub):
    img = np.zeros((1024, 2048, 3), np.uint8)
    r = RemoteRefiner(base_url=stub, max_image_size=512 * 512)
    out = r.extend("look around", image=img)
    assert out.status
    content = _Stub.seen[0]["messages"][1]["content"]
    kinds = [c["type"] for c in content]
    assert kinds == ["image_url", "text"]
    assert content[0]["image_url"]["url"].startswith("data:image/png;base64,")


def test_remote_refiner_requires_endpoint(monkeypatch):
    monkeypatch.delenv("YUME_REFINE_URL", raising=False)
    with pytest.raises(ValueError):
        RemoteRefiner()
