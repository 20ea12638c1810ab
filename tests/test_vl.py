"""Remote VL custom models against a stub OpenAI-compatible server."""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vl_server():
    responses = {"OCR:": "hello vl", "Formula Recognition:": "$x^2$",
                 "Table Recognition:": "```html\n<table><tr><td>a</td></tr></table>\n```"}

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            prompt = body["messages"][0]["content"][1]["text"]
            assert body["messages"][0]["content"][0]["image_url"]["url"].startswith(
                "data:image/jpeg;base64,"
            )
            out = {"choices": [{"message": {"content": responses[prompt]}}]}
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_vl_models(vl_server):
    from rapiddoc_tpu.models.vl import (
        PaddleOCRVLFormulaModel,
        PaddleOCRVLOCRModel,
        PaddleOCRVLTableModel,
        VLClient,
    )

    client = VLClient(api_base=vl_server)
    img = np.zeros((40, 80, 3), np.uint8)

    ocr = PaddleOCRVLOCRModel(client)
    items = ocr.batch_predict([img])[0]
    assert items[0]["text"] == "hello vl"
    assert items[0]["box"] == [[0, 0], [80, 0], [80, 40], [0, 40]]

    assert PaddleOCRVLFormulaModel(client).batch_predict([img]) == ["x^2"]
    html = PaddleOCRVLTableModel(client).batch_predict([img])[0]
    assert html == "<table><tr><td>a</td></tr></table>"


def test_vl_shorthand_requires_env(monkeypatch):
    from rapiddoc_tpu.models.custom import resolve_custom

    monkeypatch.delenv("PADDLEOCRVL_API_BASE", raising=False)
    monkeypatch.delenv("RAPIDDOC_VL_API_BASE", raising=False)
    with pytest.raises(ValueError):
        resolve_custom({"custom_model": "paddleocr_vl"}, "formula")


def test_vl_shorthand_builds(vl_server, monkeypatch):
    from rapiddoc_tpu.models.custom import resolve_custom
    from rapiddoc_tpu.models.vl import PaddleOCRVLTableModel

    monkeypatch.setenv("PADDLEOCRVL_API_BASE", vl_server)
    model = resolve_custom({"custom_model": "paddleocr_vl"}, "table")
    assert isinstance(model, PaddleOCRVLTableModel)
