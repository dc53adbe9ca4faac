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


# --- cancellation + timeouts (VERDICT r2 next #9) ---------------------------

def _slow_backend_factory(hold: "threading.Event", started: "threading.Event"):
    """Backend that signals start and blocks until released — simulates an
    in-flight non-preemptible compiled step."""
    def backend(task: Task, out_dir: str):
        started.set()
        hold.wait(timeout=30)
        from dualforce_tpu.utils.av_io import save_video_with_audio

        video = np.zeros((2, 16, 16, 3), np.uint8)
        out = save_video_with_audio(f"{out_dir}/{task.task_id}.mp4", video,
                                    np.zeros(100, np.float32), fps=24.0,
                                    sample_rate=48000)
        return {"file_path": out}
    return backend


def _spawn(srv):
    """Start a VideoServer on an ephemeral port; returns (base_url, stop)."""
    import asyncio

    from aiohttp import web

    runner = web.AppRunner(srv.app)
    loop = asyncio.new_event_loop()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 0)
        loop.run_until_complete(site.start())
        holder["port"] = site._server.sockets[0].getsockname()[1]
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        if "port" in holder:
            break
        time.sleep(0.05)
    return (f"http://127.0.0.1:{holder['port']}",
            lambda: loop.call_soon_threadsafe(loop.stop))


def test_cancel_queued_and_running(tmp_path):
    hold, started = threading.Event(), threading.Event()
    srv = VideoServer(_slow_backend_factory(hold, started),
                      out_dir=str(tmp_path / "out"))
    base, stop = _spawn(srv)
    try:
        client = VideoClient(base, timeout=10)
        first = client.submit_video_task("running one", _png_bytes(),
                                         size="32x32", num_frames=4)
        assert started.wait(timeout=10)  # worker is inside the backend
        second = client.submit_video_task("queued one", _png_bytes(),
                                          size="32x32", num_frames=4)

        # queued task cancels immediately
        resp = client.cancel(second.task_id)
        assert resp.status == "cancelled"
        assert client.get_task(second.task_id).status == "cancelled"

        # running task: flips to cancelling, resolves to cancelled once the
        # in-flight step finishes, and its result is discarded
        resp = client.cancel(first.task_id)
        assert resp.status == "cancelling"
        hold.set()
        done = client.wait_for_completion(first.task_id, poll_interval=0.1,
                                          timeout=20)
        assert done.status == "cancelled"
        assert done.download_url is None

        # cancelling a terminal task is a 409
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            base + f"/v1/videos/{second.task_id}/cancel", data=b"",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=5)
        assert e.value.code == 409

        # the cancelled queued task is never executed
        time.sleep(0.3)
        assert client.get_task(second.task_id).status == "cancelled"
    finally:
        hold.set()
        stop()


def test_queue_timeout(tmp_path):
    """A task whose queue wait exceeds timeout_s fails as timed out — both
    lazily on status reads and at worker pop."""
    hold, started = threading.Event(), threading.Event()
    srv = VideoServer(_slow_backend_factory(hold, started),
                      out_dir=str(tmp_path / "out"), queue_timeout_s=600.0)
    base, stop = _spawn(srv)
    try:
        client = VideoClient(base, timeout=10)
        blocker = client.submit_video_task("blocker", _png_bytes(),
                                           size="32x32", num_frames=4)
        assert started.wait(timeout=10)
        # per-request timeout overrides the server default
        doomed = client.submit_video_task("doomed", _png_bytes(),
                                          size="32x32", num_frames=4,
                                          timeout_s=0.2)
        time.sleep(0.4)
        t = client.get_task(doomed.task_id)  # lazy expiry on read
        assert t.status == "failed" and "timed out" in (t.error or "")
        hold.set()
        done = client.wait_for_completion(blocker.task_id, poll_interval=0.1,
                                          timeout=20)
        assert done.status == "completed"  # the running task is unaffected
    finally:
        hold.set()
        stop()


def test_cancelling_recovers_to_cancelled_on_restart(tmp_path):
    """tasks.json with a 'cancelling' task: restart resolves it to cancelled
    (the in-flight program died with the process)."""
    out = str(tmp_path / "out")
    srv1 = VideoServer(_fake_backend, out_dir=out)
    srv1.store.add(Task(task_id="c1", status="cancelling", prompt="x"))
    srv2 = VideoServer(_fake_backend, out_dir=out)
    assert srv2.store.get("c1").status == "cancelled"


def test_taskstore_cas_races(tmp_path):
    """TaskStore CAS semantics close the cancel/worker races: a cancel can
    never overwrite a terminal state, a cancelled-out-of-queue task can't be
    resurrected to 'running', and a mid-generation cancel resolves to
    'cancelled' no matter how it interleaves with the worker's completion."""
    from dualforce_tpu.serving.server import Task, TaskStore

    store = TaskStore(str(tmp_path))
    store.add(Task(task_id="t1", prompt="x", status="queued"))

    # worker wins the queue pop; late cancel of a completed task -> no change
    assert store.transition("t1", ("queued",), "running") == ("running", True)
    assert store.resolve_finished("t1", file_path="f") == "completed"
    assert store.transition("t1", ("queued",), "cancelled") \
        == ("completed", False)
    assert store.transition("t1", ("running",), "cancelling") \
        == ("completed", False)
    assert store.get("t1").status == "completed"

    # cancel wins between queue pop and the worker's running CAS -> the
    # worker must drop the task, not resurrect it
    store.add(Task(task_id="t2", prompt="x", status="queued"))
    assert store.transition("t2", ("queued",), "cancelled") \
        == ("cancelled", True)
    assert store.transition("t2", ("queued",), "running") \
        == ("cancelled", False)

    # cancel lands mid-generation: resolve_finished discards the result
    store.add(Task(task_id="t3", prompt="x", status="queued"))
    store.transition("t3", ("queued",), "running")
    assert store.transition("t3", ("running",), "cancelling") \
        == ("cancelling", True)
    assert store.resolve_finished("t3", file_path="f") == "cancelled"
    assert store.get("t3").file_path is None

    # backend exception on a non-cancelled task -> failed with the error
    store.add(Task(task_id="t4", prompt="x", status="queued"))
    store.transition("t4", ("queued",), "running")
    assert store.resolve_finished("t4", error="boom") == "failed"
    assert store.get("t4").error == "boom"

    # unknown id is inert
    assert store.transition("nope", ("queued",), "running") == (None, False)
    assert store.resolve_finished("nope") is None
