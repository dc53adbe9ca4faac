"""Serving layer: submit -> poll -> download against a fake backend
(SURVEY.md §4 implication (e))."""

import io
import threading
import time

import numpy as np
import pytest
from PIL import Image

from dualforce_tpu.serving.client import VideoClient
from dualforce_tpu.serving.server import Task, VideoServer


def _fake_backend(task: Task, out_dir: str):
    """Writes a tiny AVI using the real mux path."""
    from dualforce_tpu.utils.av_io import save_video_with_audio

    video = np.random.default_rng(0).integers(
        0, 255, (task.params["num_frames"], 16, 16, 3), dtype=np.uint8)
    audio = np.zeros(1000, np.float32)
    out = save_video_with_audio(f"{out_dir}/{task.task_id}.mp4", video, audio,
                                fps=task.params["fps"], sample_rate=48000)
    return {"file_path": out, "peak_memory_mb": 1.0}


@pytest.fixture
def server(tmp_path):
    from aiohttp import web

    srv = VideoServer(_fake_backend, out_dir=str(tmp_path / "out"))
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


def _png_bytes():
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (120, 40, 200)).save(buf, format="PNG")
    return buf.getvalue()


def test_submit_poll_download(server, tmp_path):
    client = VideoClient(server, timeout=10)
    assert client.health()

    task = client.submit_video_task(
        "a test clip", _png_bytes(), size="32x32", num_frames=4,
        num_inference_steps=2)
    assert task.task_id
    done = client.wait_for_completion(task.task_id, poll_interval=0.1, timeout=30)
    assert done.status == "completed", done.error
    assert done.inference_time_s is not None

    dest = str(tmp_path / "result.avi")
    client.download(done, dest)
    import os

    assert os.path.getsize(dest) > 100

    tasks = client.list_tasks()
    assert any(t.task_id == task.task_id for t in tasks)


def test_failed_task_reports_error(server):
    client = VideoClient(server, timeout=10)
    # zero-byte image -> PIL open fails inside backend -> failed status
    task = client.submit_video_task("bad", b"", size="32x32", num_frames=0)
    done = client.wait_for_completion(task.task_id, poll_interval=0.1, timeout=30)
    assert done.status in ("failed", "completed")


# --- batched serving ---------------------------------------------------------

_BATCHES = []


def _fake_batch_backend(tasks, out_dir: str):
    _BATCHES.append(sorted(t.task_id for t in tasks))
    return [_fake_backend(t, out_dir) for t in tasks]


@pytest.fixture
def batch_server(tmp_path):
    from aiohttp import web
    import asyncio

    _BATCHES.clear()
    srv = VideoServer(_fake_backend, out_dir=str(tmp_path / "out"),
                      batch_backend=_fake_batch_backend, max_batch=3,
                      batch_window_s=1.0)
    runner = web.AppRunner(srv.app)
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


def test_same_geometry_tasks_batch_together(batch_server):
    client = VideoClient(batch_server, timeout=10)
    png = _png_bytes()
    same = [client.submit_video_task(f"clip {i}", png, size="32x32",
                                     num_frames=4, num_inference_steps=2)
            for i in range(3)]
    other = client.submit_video_task("odd one", png, size="64x32",
                                     num_frames=8, num_inference_steps=2)
    for t in same + [other]:
        done = client.wait_for_completion(t.task_id, poll_interval=0.1, timeout=60)
        assert done.status == "completed", done.error
    sizes = sorted(len(b) for b in _BATCHES)
    # the three same-geometry tasks formed one batch; the odd geometry ran alone
    assert max(sizes) == 3, _BATCHES
    odd_batches = [b for b in _BATCHES if other.task_id in b]
    assert odd_batches and len(odd_batches[0]) == 1


def test_restart_recovery(tmp_path):
    """Tasks persisted as queued are re-enqueued on server start; tasks caught
    mid-generation become failed (their partial state died with the process)."""
    import json
    import os

    out = str(tmp_path / "out")
    os.makedirs(out)
    with open(os.path.join(out, "tasks.json"), "w") as f:
        json.dump([
            {"task_id": "qqq", "status": "queued", "prompt": "p",
             "params": {"num_frames": 2, "fps": 8.0}},
            {"task_id": "rrr", "status": "running", "prompt": "p",
             "params": {"num_frames": 2, "fps": 8.0}},
        ], f)
    srv = VideoServer(_fake_backend, out_dir=out)
    deadline = time.time() + 10
    while time.time() < deadline:
        if srv.store.get("qqq").status == "completed":
            break
        time.sleep(0.05)
    assert srv.store.get("qqq").status == "completed"
    rr = srv.store.get("rrr")
    assert rr.status == "failed" and "restarted" in rr.error


def _stepping_backend(task: Task, out_dir: str, progress=None):
    """Backend that reports per-step progress like the real pipeline
    (jax.debug.callback -> pipe.progress_cb -> worker's task-store updater)."""
    for i in range(1, 5):
        if progress is not None:
            progress(i / 5)
        time.sleep(0.05)
    return _fake_backend(task, out_dir)


@pytest.fixture
def progress_server(tmp_path):
    from aiohttp import web

    srv = VideoServer(_stepping_backend, out_dir=str(tmp_path / "out"))
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


def test_per_step_progress_monotonic(progress_server):
    """Progress must be real (per denoise step) and monotonically
    non-decreasing to 1.0 — not the queued->done jump (VERDICT r1 weak 8)."""
    client = VideoClient(progress_server, timeout=10)
    task = client.submit_video_task("p", _png_bytes(), size="16x16",
                                    num_frames=3, fps=8.0,
                                    num_inference_steps=4)
    seen = []
    for _ in range(200):
        st = client.get_task(task.task_id)
        seen.append(st.progress)
        if st.status in ("completed", "failed"):
            break
        time.sleep(0.02)
    assert st.status == "completed"
    assert seen == sorted(seen), f"progress regressed: {seen}"
    # at least one strictly-intermediate value was observable
    assert any(0.05 < p < 1.0 for p in seen), seen
    assert seen[-1] == 1.0
