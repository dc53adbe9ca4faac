"""Workflow layer: full-mode pipeline (first-frame gen -> element extraction
-> prompt rewrite -> generation) against the offline LLM fallbacks, plus the
per-task artifact directory endpoints."""

import json
import threading
import time
import urllib.request

import pytest

from dualforce_tpu.serving.server import VideoServer
from dualforce_tpu.workflow.app import attach_ui

from test_serving import _fake_backend  # noqa: E402 — shared fixture helpers


@pytest.fixture
def ui_server(tmp_path):
    from aiohttp import web

    srv = VideoServer(_fake_backend, out_dir=str(tmp_path / "out"))
    attach_ui(srv)
    runner = web.AppRunner(srv.app)

    import asyncio

    loop = asyncio.new_event_loop()
    port_holder = {}

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 0)
        loop.run_until_complete(site.start())
        port_holder["port"] = site._server.sockets[0].getsockname()[1]
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "port" in port_holder:
            break
        time.sleep(0.05)
    yield f"http://127.0.0.1:{port_holder['port']}"
    loop.call_soon_threadsafe(loop.stop)


def _get_json(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def test_full_workflow_and_artifacts(ui_server):
    req = urllib.request.Request(
        f"{ui_server}/workflow/full",
        data=json.dumps({"idea": "a corgi drumming", "size": "32x32",
                         "num_frames": 3, "num_inference_steps": 2}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        sub = json.loads(r.read())
    assert sub["task_id"]
    assert "corgi" in sub["rewritten_prompt"].lower()

    # poll to completion
    for _ in range(300):
        st = _get_json(f"{ui_server}/v1/videos/{sub['task_id']}")
        if st["status"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert st["status"] == "completed", st.get("error")

    # per-task artifact dir: idea/elements/prompt text + first frame
    art = _get_json(f"{ui_server}/workflow/tasks/{sub['task_id']}")
    names = set(art["artifacts"])
    assert {"idea.txt", "prompt.txt", "elements.txt",
            "first_frame.png"} <= names
    assert art["artifacts"]["idea.txt"] == "a corgi drumming"
    # binary artifact serves over HTTP
    with urllib.request.urlopen(
            f"{ui_server}{art['artifacts']['first_frame.png']}",
            timeout=10) as r:
        assert len(r.read()) > 100


def test_task_id_traversal_rejected(ui_server):
    """`..` (or any non-id path) must not escape the tasks/ directory — the
    artifacts endpoint would otherwise list/serve arbitrary out_dir files."""
    import urllib.error

    import http.client
    from urllib.parse import urlparse

    u = urlparse(ui_server)
    for raw in ("/workflow/tasks/..", "/workflow/tasks/../tasks.json"):
        # urllib normalizes "..", so speak raw HTTP
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=10)
        conn.request("GET", raw)
        resp = conn.getresponse()
        assert resp.status == 404, raw
        conn.close()


def test_ui_index_served(ui_server):
    with urllib.request.urlopen(ui_server + "/", timeout=10) as r:
        html = r.read().decode()
    assert "DualForce-TPU Studio" in html
    assert "/workflow/full" in html


def test_ui_has_cancel_and_artifact_gallery(ui_server):
    """UI parity features (VERDICT r2 next #9): task cards wire a cancel
    action and an inline artifact gallery (first-frame preview + labeled
    idea/elements/rewritten-prompt sections)."""
    import urllib.request

    with urllib.request.urlopen(ui_server + "/", timeout=5) as r:
        html = r.read().decode()
    assert "cancelTask" in html and "/cancel" in html
    assert "loadArtifacts" in html and "artifacts" in html
    assert "Rewritten prompt" in html and "Extracted elements" in html
    assert "<img" in html or "img src" in html
