"""Multi-server studio (workflow/studio.py): registry listing, server
selection, and the transparent /v1 proxy — the reference's SGLANG_SERVERS
multi-endpoint workflow (workflow/config.py:16-29)."""

import asyncio
import json
import threading
import time
import urllib.request

import pytest

from dualforce_tpu.serving.server import VideoServer
from dualforce_tpu.workflow.studio import Studio, parse_servers

from test_serving import _fake_backend  # noqa: E402 — shared fixture helpers


def _run_app(app, port_holder):
    from aiohttp import web

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        runner = web.AppRunner(app)
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
    return loop


def _get_json(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _post_json(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read()), r.status


@pytest.fixture
def two_servers_and_studio(tmp_path):
    loops = []
    ports = []
    servers = []
    for i in range(2):
        srv = VideoServer(_fake_backend, out_dir=str(tmp_path / f"out{i}"))
        holder = {}
        loops.append(_run_app(srv.app, holder))
        ports.append(holder["port"])
        servers.append(srv)
    spec = (f"mova-360p=http://127.0.0.1:{ports[0]},"
            f"mova-720p=http://127.0.0.1:{ports[1]}")
    studio = Studio(parse_servers(spec))
    holder = {}
    loops.append(_run_app(studio.app, holder))
    base = f"http://127.0.0.1:{holder['port']}"
    yield base, servers, ports
    for loop in loops:
        loop.call_soon_threadsafe(loop.stop)


def _submit(base, prompt):
    import io

    boundary = "xxformboundary"
    body = io.BytesIO()

    def field(name, value):
        body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                   f"name=\"{name}\"\r\n\r\n{value}\r\n".encode())

    field("prompt", prompt)
    field("size", "32x32")
    field("num_frames", "3")
    field("num_inference_steps", "2")
    body.write(f"--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        base + "/v1/videos", data=body.getvalue(),
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_parse_servers():
    got = parse_servers("a=http://x:1, b = http://y:2/ ")
    assert got == {"a": "http://x:1", "b": "http://y:2"}
    with pytest.raises(ValueError):
        parse_servers("")
    with pytest.raises(ValueError):
        parse_servers("justaurl")


def test_registry_select_and_proxy_routing(two_servers_and_studio):
    base, servers, ports = two_servers_and_studio

    # registry lists both, first is active, both healthy
    js = _get_json(base + "/workflow/servers")
    names = [s["name"] for s in js["servers"]]
    assert names == ["mova-360p", "mova-720p"]
    assert [s["active"] for s in js["servers"]] == [True, False]
    assert all(s["healthy"] for s in js["servers"])

    # health endpoint proxies to the active upstream
    assert _get_json(base + "/health")["status"] == "ok"

    # a submit through the studio lands on the ACTIVE server only
    t1 = _submit(base, "clip for 360p")
    deadline = time.time() + 20
    while time.time() < deadline:
        if _get_json(base + f"/v1/videos/{t1['task_id']}")["status"] \
                == "completed":
            break
        time.sleep(0.2)
    direct0 = _get_json(f"http://127.0.0.1:{ports[0]}/v1/videos")["data"]
    direct1 = _get_json(f"http://127.0.0.1:{ports[1]}/v1/videos")["data"]
    assert [t["task_id"] for t in direct0] == [t1["task_id"]]
    assert direct1 == []

    # switch the active server; the same UI paths now hit server 2
    got, _ = _post_json(base + "/workflow/select", {"name": "mova-720p"})
    assert got == {"active": "mova-720p"}
    t2 = _submit(base, "clip for 720p")
    direct1 = _get_json(f"http://127.0.0.1:{ports[1]}/v1/videos")["data"]
    assert [t["task_id"] for t in direct1] == [t2["task_id"]]
    listed = _get_json(base + "/v1/videos")["data"]
    assert [t["task_id"] for t in listed] == [t2["task_id"]]

    # unknown selection -> 404
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base + "/workflow/select", {"name": "nope"})
    assert e.value.code == 404


def test_proxy_upstream_down_returns_502(tmp_path):
    studio = Studio({"dead": "http://127.0.0.1:9"})  # port 9: discard, closed
    holder = {}
    loop = _run_app(studio.app, holder)
    base = f"http://127.0.0.1:{holder['port']}"
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            _get_json(base + "/v1/videos")
        assert e.value.code == 502
        js = _get_json(base + "/workflow/servers")
        assert js["servers"][0]["healthy"] is False
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_proxy_streams_large_and_gzip_bodies(tmp_path):
    """The proxy must stream upstream bodies (video downloads are hundreds
    of MB — never buffered whole) byte-exactly, and must drop the upstream
    content-encoding header: the client session already decompressed the
    body, so forwarding it would make the browser re-decode plain bytes.
    Bad /workflow/select bodies are a 400, not a 500."""
    import gzip
    import urllib.error

    from aiohttp import web

    big = bytes(range(256)) * (4 << 12)  # 4 MiB

    async def big_handler(request):
        return web.Response(body=big,
                            content_type="application/octet-stream")

    async def gz_handler(request):
        payload = gzip.compress(json.dumps({"ok": True}).encode())
        return web.Response(body=payload, content_type="application/json",
                            headers={"Content-Encoding": "gzip"})

    up = web.Application()
    up.router.add_get("/v1/big", big_handler)
    up.router.add_get("/v1/gz", gz_handler)
    h1 = {}
    loop1 = _run_app(up, h1)
    studio = Studio({"up": f"http://127.0.0.1:{h1['port']}"})
    h2 = {}
    loop2 = _run_app(studio.app, h2)
    base = f"http://127.0.0.1:{h2['port']}"
    try:
        with urllib.request.urlopen(base + "/v1/big", timeout=30) as r:
            assert r.read() == big

        with urllib.request.urlopen(base + "/v1/gz", timeout=30) as r:
            assert r.headers.get("Content-Encoding") is None
            assert json.loads(r.read()) == {"ok": True}

        req = urllib.request.Request(
            base + "/workflow/select", data=b"not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
    finally:
        loop1.call_soon_threadsafe(loop1.stop)
        loop2.call_soon_threadsafe(loop2.stop)
