"""Web UI for AI-assisted generation (behavioural reference: workflow/app.py —
Streamlit two-mode UI; this image has no streamlit, so the UI is a single-page
app served by aiohttp alongside the /v1/videos API).

Modes mirrored: simple (prompt + reference image -> video) and full
(text -> first-frame gen -> element extraction -> prompt rewrite -> video),
with task polling and history cards.
"""

from __future__ import annotations

import base64
import json

from aiohttp import web

from dualforce_tpu.workflow.config import WorkflowConfig
from dualforce_tpu.workflow.llm_helpers import (
    extract_visual_elements,
    generate_first_frame,
    rewrite_prompt,
)

INDEX_HTML = """<!DOCTYPE html>
<html><head><title>DualForce-TPU Studio</title>
<style>
body{font-family:system-ui;margin:2rem auto;max-width:860px;color:#222}
fieldset{border:1px solid #ccc;border-radius:8px;margin-bottom:1rem}
textarea,input{width:100%;box-sizing:border-box;margin:.25rem 0}
button{padding:.5rem 1rem;border-radius:6px;border:0;background:#3b5bdb;color:#fff;cursor:pointer}
.task{border:1px solid #ddd;border-radius:8px;padding:.6rem;margin:.4rem 0}
.status-completed{color:#2b8a3e}.status-failed{color:#c92a2a}.status-running{color:#e8590c}
</style></head>
<body>
<h1>DualForce-TPU Studio</h1>
<fieldset><legend>Simple mode: prompt + reference image</legend>
<textarea id="prompt" rows="3" placeholder="describe the video + audio"></textarea>
<input type="file" id="ref">
<label>Size <input id="size" value="640x352"></label>
<label>Frames <input id="frames" value="193"></label>
<label>Steps <input id="steps" value="50"></label>
<label>Seed <input id="seed" value="42"></label>
<button onclick="submitSimple()">Generate</button>
</fieldset>
<fieldset><legend>Full mode: text only (first-frame gen + prompt rewrite)</legend>
<textarea id="idea" rows="2" placeholder="one-line idea"></textarea>
<button onclick="submitFull()">Run full workflow</button>
</fieldset>
<h2>Tasks</h2><div id="tasks"></div>
<script>
async function submitSimple(){
  const fd = new FormData();
  fd.append('prompt', document.getElementById('prompt').value);
  fd.append('size', document.getElementById('size').value);
  fd.append('num_frames', document.getElementById('frames').value);
  fd.append('num_inference_steps', document.getElementById('steps').value);
  fd.append('seed', document.getElementById('seed').value);
  const f = document.getElementById('ref').files[0];
  if (f) fd.append('input_reference', f);
  await fetch('/v1/videos', {method:'POST', body:fd});
  refresh();
}
async function submitFull(){
  const r = await fetch('/workflow/full', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({idea:document.getElementById('idea').value})});
  refresh();
}
async function refresh(){
  const r = await fetch('/v1/videos'); const js = await r.json();
  const el = document.getElementById('tasks'); el.innerHTML='';
  js.data.sort((a,b)=>b.created_at-a.created_at).forEach(t=>{
    const d = document.createElement('div'); d.className='task';
    let link = t.status==='completed'?`<a href="${t.download_url}">download</a>`:'';
    d.innerHTML = `<b>${t.task_id}</b> <span class="status-${t.status}">${t.status}</span>
      (${Math.round(t.progress*100)}%) — ${t.prompt.slice(0,80)} ${link}`;
    el.appendChild(d);
  });
}
setInterval(refresh, 3000); refresh();
</script></body></html>"""


def attach_ui(server, wf_cfg: WorkflowConfig | None = None):
    """Mount the UI + full-workflow endpoint onto a serving.VideoServer."""
    wf_cfg = wf_cfg or WorkflowConfig()

    async def index(request):
        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def full_workflow(request):
        import asyncio

        body = await request.json()
        idea = body.get("idea", "")
        w, h = (int(x) for x in body.get("size", "640x352").split("x"))
        # the LLM helpers are blocking urllib calls with minute-scale
        # timeouts — run them in the default executor so the event loop
        # (status polling, downloads) stays responsive
        loop = asyncio.get_running_loop()
        # 1. first frame
        image_bytes = await loop.run_in_executor(
            None, lambda: generate_first_frame(idea, w, h, wf_cfg))
        b64 = base64.b64encode(image_bytes).decode()
        # 2. element extraction feeds 3. prompt rewrite
        elements = await loop.run_in_executor(
            None, lambda: extract_visual_elements(b64, wf_cfg))
        full_prompt = await loop.run_in_executor(
            None, lambda: rewrite_prompt(
                idea + ("\nVisual elements:\n" + elements if elements else ""),
                wf_cfg, image_b64=b64))
        # 4. submit generation
        from dualforce_tpu.serving.server import Task
        import uuid

        task_id = uuid.uuid4().hex[:16]
        import os

        image_path = os.path.join(server.out_dir, f"{task_id}.input.bin")
        with open(image_path, "wb") as f:
            f.write(image_bytes)
        task = Task(task_id=task_id, prompt=full_prompt,
                    params={"negative_prompt": "", "height": h, "width": w,
                            "num_frames": int(body.get("num_frames", 193)),
                            "fps": float(body.get("fps", 24.0)),
                            "seed": int(body.get("seed", 42)),
                            "guidance_scale": float(body.get("guidance_scale", 5.0)),
                            "num_inference_steps": int(body.get("num_inference_steps", 50)),
                            "image_path": image_path})
        server.store.add(task)
        server.queue.put(task.task_id)
        return web.json_response({"task_id": task.task_id,
                                  "rewritten_prompt": full_prompt})

    server.app.add_routes([web.get("/", index),
                           web.get("/ui", index),
                           web.post("/workflow/full", full_workflow)])
    return server
