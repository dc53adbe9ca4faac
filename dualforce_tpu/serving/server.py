"""HTTP video-generation service.

Mirrors the serving surface the reference gets from SGLang
(README.md:153-212, workflow/launch_sglang_server.sh): REST `/v1/videos`
multipart submit (prompt, input_reference, size, num_frames, fps, seed,
guidance_scale, num_inference_steps), task-status polling, file download,
`/health` + `/v1/models` probes.

Implementation: aiohttp app + a single background worker thread draining a
task queue into the generation backend (the jitted sampler keeps the chip busy;
requests with the same geometry bucket reuse the compiled program). The
backend is injectable — tests use a fake; production passes
`make_pipeline_backend(pipe)`.
"""

from __future__ import annotations

import asyncio
import io
import json
import os
import threading
import time
import traceback
import uuid
from dataclasses import asdict, dataclass, field
from queue import Queue
from typing import Any, Callable, Dict, Optional

import numpy as np
from aiohttp import web


@dataclass
class Task:
    task_id: str
    status: str = "queued"            # queued | running | completed | failed
    prompt: str = ""
    progress: float = 0.0
    created_at: float = field(default_factory=time.time)
    completed_at: Optional[float] = None
    file_path: Optional[str] = None
    download_url: Optional[str] = None
    error: Optional[str] = None
    inference_time_s: Optional[float] = None
    peak_memory_mb: Optional[float] = None
    params: Dict[str, Any] = field(default_factory=dict)


class TaskStore:
    """In-memory task registry persisted to tasks.json (workflow/app.py style)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._tasks: Dict[str, Task] = {}
        self._lock = threading.Lock()
        self._path = os.path.join(out_dir, "tasks.json")
        self._load()

    def _load(self):
        if os.path.exists(self._path):
            try:
                with open(self._path) as f:
                    for rec in json.load(f):
                        self._tasks[rec["task_id"]] = Task(**rec)
            except (json.JSONDecodeError, TypeError):
                pass

    def _persist(self):
        with open(self._path, "w") as f:
            json.dump([asdict(t) for t in self._tasks.values()], f)

    def add(self, task: Task):
        with self._lock:
            self._tasks[task.task_id] = task
            self._persist()

    def update(self, task_id: str, **kw):
        with self._lock:
            t = self._tasks[task_id]
            for k, v in kw.items():
                setattr(t, k, v)
            self._persist()

    def get(self, task_id: str) -> Optional[Task]:
        return self._tasks.get(task_id)

    def all(self):
        return list(self._tasks.values())


def make_pipeline_backend(pipe) -> Callable:
    """Wrap a MOVAPipeline into the backend callable used by the worker."""
    from dualforce_tpu.data.transforms import crop_and_resize, image_to_tensor
    from dualforce_tpu.utils.av_io import save_video_with_audio
    from dualforce_tpu.utils.misc import hbm_stats
    from PIL import Image

    def backend(task: Task, out_dir: str) -> Dict[str, Any]:
        p = task.params
        h, w = p["height"], p["width"]
        image = Image.open(io.BytesIO(bytes.fromhex(p["image_hex"]))).convert("RGB")
        image = crop_and_resize(image, h, w)
        result = pipe(
            prompt=task.prompt, image=image_to_tensor(image),
            negative_prompt=p.get("negative_prompt", ""),
            seed=p.get("seed", 42), height=h, width=w,
            num_frames=p.get("num_frames", 193), video_fps=p.get("fps", 24.0),
            num_inference_steps=p.get("num_inference_steps", 50),
            cfg_scale=p.get("guidance_scale", 5.0))
        out = save_video_with_audio(
            os.path.join(out_dir, f"{task.task_id}.mp4"), result.video,
            result.audio, fps=result.fps, sample_rate=result.sample_rate)
        peak = hbm_stats().get("peak_bytes_in_use", 0) / 1e6
        return {"file_path": out, "peak_memory_mb": peak}

    return backend


class VideoServer:
    def __init__(self, backend: Callable, out_dir: str = "./server_outputs",
                 model_name: str = "dualforce-tpu/mova"):
        self.backend = backend
        self.store = TaskStore(out_dir)
        self.out_dir = out_dir
        self.model_name = model_name
        self.queue: "Queue[str]" = Queue()
        self._worker = threading.Thread(target=self._run_worker, daemon=True)
        self._worker.start()
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self.app.add_routes([
            web.get("/health", self.health),
            web.get("/v1/models", self.models),
            web.post("/v1/videos", self.submit),
            web.get("/v1/videos", self.list_tasks),
            web.get("/v1/videos/{task_id}", self.status),
            web.get("/v1/videos/{task_id}/content", self.download),
        ])

    # --- worker -------------------------------------------------------------
    def _run_worker(self):
        while True:
            task_id = self.queue.get()
            task = self.store.get(task_id)
            if task is None:
                continue
            self.store.update(task_id, status="running", progress=0.05)
            t0 = time.time()
            try:
                result = self.backend(task, self.out_dir)
                self.store.update(
                    task_id, status="completed", progress=1.0,
                    completed_at=time.time(),
                    inference_time_s=time.time() - t0,
                    file_path=result.get("file_path"),
                    peak_memory_mb=result.get("peak_memory_mb"),
                    download_url=f"/v1/videos/{task_id}/content")
            except Exception as e:  # noqa: BLE001 — task-level failure isolation
                traceback.print_exc()
                self.store.update(task_id, status="failed", error=str(e))

    # --- handlers -----------------------------------------------------------
    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def models(self, request):
        return web.json_response({"data": [{"id": self.model_name}]})

    async def submit(self, request):
        if request.content_type.startswith("multipart"):
            fields: Dict[str, Any] = {}
            image_bytes = b""
            async for part in (await request.multipart()):
                if part.name == "input_reference":
                    image_bytes = await part.read(decode=False)
                else:
                    fields[part.name] = (await part.text())
        else:
            fields = dict(await request.post())
            image_bytes = b""
        size = fields.get("size", "640x352")
        w, h = (int(x) for x in size.split("x"))
        task = Task(
            task_id=uuid.uuid4().hex[:16],
            prompt=fields.get("prompt", ""),
            params={
                "negative_prompt": fields.get("negative_prompt", ""),
                "height": h, "width": w,
                "num_frames": int(fields.get("num_frames", 193)),
                "fps": float(fields.get("fps", 24.0)),
                "seed": int(fields.get("seed", 42)),
                "guidance_scale": float(fields.get("guidance_scale", 5.0)),
                "num_inference_steps": int(fields.get("num_inference_steps", 50)),
                "image_hex": image_bytes.hex(),
            })
        self.store.add(task)
        self.queue.put(task.task_id)
        return web.json_response({"task_id": task.task_id, "status": task.status})

    async def status(self, request):
        task = self.store.get(request.match_info["task_id"])
        if task is None:
            return web.json_response({"error": "not found"}, status=404)
        d = asdict(task)
        d["params"].pop("image_hex", None)
        return web.json_response(d)

    async def list_tasks(self, request):
        out = []
        for t in self.store.all():
            d = asdict(t)
            d["params"].pop("image_hex", None)
            out.append(d)
        return web.json_response({"data": out})

    async def download(self, request):
        task = self.store.get(request.match_info["task_id"])
        if task is None or not task.file_path or not os.path.exists(task.file_path):
            return web.json_response({"error": "not ready"}, status=404)
        return web.FileResponse(task.file_path)

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        web.run_app(self.app, host=host, port=port)
