"""Provider adapters for the workflow's external-LLM steps (Gemini /
DashScope / OpenAI-compatible), driven against a local fake HTTP server that
records requests and answers with each API's response shape. Covers the
reference's routing rule (Gemini key > DashScope key > generic endpoint;
api_utils.py:12-26) and the per-API payload contracts
(generate_first_frame.py, qwen_vl_api.py)."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dualforce_tpu.workflow.config import WorkflowConfig
from dualforce_tpu.workflow import providers
from dualforce_tpu.workflow.llm_helpers import (
    extract_visual_elements,
    first_frame_prompt,
    generate_first_frame,
    rewrite_prompt,
)

PNG_BYTES = base64.b64decode(  # 1x1 black pixel
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNgYGBg"
    "AAAABQABh6FO1AAAAABJRU5ErkJggg==")


class _FakeAPIs(BaseHTTPRequestHandler):
    """One server, all three provider surfaces, path-discriminated."""

    requests_log = []
    fail_gemini = False

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):  # Z-Image returns an image URL to fetch
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.end_headers()
        self.wfile.write(PNG_BYTES)

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_log.append(
            {"path": self.path, "headers": dict(self.headers), "body": body})
        if ":generateContent" in self.path:
            if type(self).fail_gemini:
                self.send_response(500)
                self.end_headers()
                return
            if "flash-image" in self.path:
                parts = [{"inlineData": {
                    "mimeType": "image/png",
                    "data": base64.b64encode(PNG_BYTES).decode()}}]
            else:
                parts = [{"text": "gemini says hi"}]
            resp = {"candidates": [{"content": {"parts": parts}}]}
        elif "text-generation" in self.path:
            resp = {"output": {"choices": [{"message": {
                "content": "dashscope says hi"}}]}}
        elif "multimodal-generation" in self.path:
            model = body.get("model", "")
            if "z-image" in model:
                host = self.headers["Host"]
                content = [{"image": f"http://{host}/fake.png"}]
            else:
                content = [{"text": "qwen-vl sees things"}]
            resp = {"output": {"choices": [{"message": {"content": content}}]}}
        elif self.path.endswith("/chat/completions"):
            resp = {"choices": [{"message": {"content": "openai says hi"}}]}
        elif self.path.endswith("/images/generations"):
            resp = {"data": [{"b64_json":
                              base64.b64encode(PNG_BYTES).decode()}]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        out = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture
def fake_api():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeAPIs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _FakeAPIs.requests_log = []
    _FakeAPIs.fail_gemini = False
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _cfg(base, *, gemini=False, dashscope=False, openai=False):
    kw = {}
    if gemini:
        kw.update(gemini_api_key="gk", gemini_api_base=base)
    if dashscope:
        kw.update(dashscope_api_key="dk", dashscope_api_base=base + "/api/v1")
    if openai:
        kw.update(llm_api_base=base + "/v1", llm_api_key="ok",
                  llm_model="m", image_api_base=base + "/v1",
                  image_api_key="ok", image_model="im")
    return WorkflowConfig(**kw)


def test_gemini_text_and_image_contract(fake_api):
    cfg = _cfg(fake_api, gemini=True)
    out, prov = providers.chat_any(cfg, "sys", "hello")
    assert (out, prov) == ("gemini says hi", "gemini")
    req = _FakeAPIs.requests_log[-1]
    assert "gemini-2.5-pro:generateContent" in req["path"]
    headers = {k.lower(): v for k, v in req["headers"].items()}
    assert headers["x-goog-api-key"] == "gk"
    assert req["body"]["system_instruction"]["parts"][0]["text"] == "sys"

    img, prov = providers.image_any(cfg, "a cat", 1280, 720)
    assert img == PNG_BYTES and prov == "gemini"
    req = _FakeAPIs.requests_log[-1]
    assert "flash-image" in req["path"]
    assert req["body"]["generationConfig"]["imageConfig"]["aspectRatio"] \
        == "16:9"


def test_dashscope_chat_vision_zimage_contract(fake_api):
    cfg = _cfg(fake_api, dashscope=True)
    out, prov = providers.chat_any(cfg, "sys", "hello")
    assert (out, prov) == ("dashscope says hi", "dashscope")
    req = _FakeAPIs.requests_log[-1]
    assert req["path"].endswith("/services/aigc/text-generation/generation")
    assert req["headers"]["Authorization"] == "Bearer dk"
    assert req["body"]["parameters"]["result_format"] == "message"
    assert req["body"]["input"]["messages"][0]["role"] == "system"

    b64 = base64.b64encode(PNG_BYTES).decode()
    out, prov = providers.chat_any(cfg, None, "describe", image_b64=b64)
    assert (out, prov) == ("qwen-vl sees things", "dashscope")
    req = _FakeAPIs.requests_log[-1]
    assert req["body"]["model"] == "qwen3-vl-plus"
    content = req["body"]["input"]["messages"][0]["content"]
    assert content[0]["image"].startswith("data:image/png;base64,")

    # Z-Image: portrait aspect maps to 720*1280, long prompts truncate to 800
    img, prov = providers.image_any(cfg, "p" * 900, 720, 1280)
    assert img == PNG_BYTES and prov == "dashscope"
    req = [r for r in _FakeAPIs.requests_log
           if r["body"].get("model") == "z-image-turbo"][-1]
    assert req["body"]["parameters"]["size"] == "720*1280"
    assert req["body"]["parameters"]["prompt_extend"] is False
    sent = req["body"]["input"]["messages"][0]["content"][0]["text"]
    assert len(sent) == 800 and sent.endswith("...")


def test_routing_priority_and_fallthrough(fake_api):
    # all three configured: Gemini wins (reference's key priority)
    cfg = _cfg(fake_api, gemini=True, dashscope=True, openai=True)
    assert providers.text_providers(cfg) == ["gemini", "dashscope", "openai"]
    _, prov = providers.chat_any(cfg, None, "hi")
    assert prov == "gemini"
    # Gemini erroring falls through to DashScope instead of raising
    _FakeAPIs.fail_gemini = True
    out, prov = providers.chat_any(cfg, None, "hi")
    assert (out, prov) == ("dashscope says hi", "dashscope")
    img, prov = providers.image_any(cfg, "x", 1280, 720)
    assert img == PNG_BYTES and prov == "dashscope"


def test_openai_only_backend(fake_api):
    cfg = _cfg(fake_api, openai=True)
    out, prov = providers.chat_any(cfg, "s", "hi")
    assert (out, prov) == ("openai says hi", "openai")
    img, prov = providers.image_any(cfg, "x", 640, 352)
    assert img == PNG_BYTES and prov == "openai"
    req = _FakeAPIs.requests_log[-1]
    assert req["body"]["size"] == "640x352"


def test_helpers_two_stage_and_offline_fallbacks(fake_api):
    cfg = _cfg(fake_api, dashscope=True)
    # full flow: generate_first_frame authors the image prompt first (LLM),
    # then calls the image backend — two DashScope calls
    n0 = len(_FakeAPIs.requests_log)
    data = generate_first_frame("a corgi drumming", 1280, 720, cfg)
    assert data == PNG_BYTES
    models = [r["body"].get("model") for r in _FakeAPIs.requests_log[n0:]]
    assert models == ["qwen-plus", "z-image-turbo"]
    assert extract_visual_elements("aGk=", cfg) == "qwen-vl sees things"
    assert rewrite_prompt("idea", cfg,
                          first_frame_elements="a corgi") \
        == "dashscope says hi"
    # the rewrite user message embeds the elements + the idea
    body = _FakeAPIs.requests_log[-1]["body"]
    user_msg = body["input"]["messages"][-1]["content"]
    assert "a corgi" in user_msg and "idea" in user_msg

    # no providers configured -> deterministic local fallbacks, no requests
    off = WorkflowConfig()
    n0 = len(_FakeAPIs.requests_log)
    assert first_frame_prompt("idea", off) == "idea"
    assert rewrite_prompt("idea", off) == "idea"
    assert extract_visual_elements("aGk=", off) == ""
    frame = generate_first_frame("idea", 64, 48, off)
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(_FakeAPIs.requests_log) == n0


def test_workflow_tools_cli(fake_api, tmp_path, monkeypatch):
    monkeypatch.setenv("DASHSCOPE_API_KEY", "dk")
    monkeypatch.setenv("DASHSCOPE_BASE_URL", fake_api + "/api/v1")
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "workflow_tools", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "workflow_tools.py"))
    wt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wt)
    img = tmp_path / "ff.png"
    pr = tmp_path / "prompt.txt"
    wt.main(["full", "--user-input", "a corgi", "--output", str(img),
             "--output-image-prompt", str(pr)])
    assert img.read_bytes() == PNG_BYTES
    assert pr.read_text() == "dashscope says hi"
    el = tmp_path / "elements.json"
    wt.main(["extract", "--image", str(img), "--output", str(el)])
    assert json.loads(el.read_text())["visual_description"] \
        == "qwen-vl sees things"
    out = tmp_path / "desc.txt"
    wt.main(["rewrite", "--user-input", "a corgi", "--elements", str(el),
             "--output", str(out)])
    assert out.read_text() == "dashscope says hi"
