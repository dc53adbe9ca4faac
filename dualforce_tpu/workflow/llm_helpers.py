"""External-LLM helper steps of the full workflow (behavioural reference:
workflow/{generate_first_frame,prompt_rewriter_with_image,qwen_vl_api}.py):
first-frame synthesis from text, visual-element extraction, and prompt
rewriting. All calls go to OpenAI-compatible endpoints configured via env;
each has a deterministic local fallback so the pipeline runs without egress.
"""

from __future__ import annotations

import base64
import json
import urllib.request
from typing import Optional

from dualforce_tpu.workflow.config import WorkflowConfig


def _chat(cfg: WorkflowConfig, messages, max_tokens: int = 512) -> str:
    req = urllib.request.Request(
        cfg.llm_api_base.rstrip("/") + "/chat/completions",
        data=json.dumps({
            "model": cfg.llm_model, "messages": messages,
            "max_tokens": max_tokens,
        }).encode(),
        headers={"Content-Type": "application/json",
                 "Authorization": f"Bearer {cfg.llm_api_key}"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.load(r)["choices"][0]["message"]["content"]


REWRITE_SYSTEM = (
    "You expand a short video idea into a detailed TI2VA generation prompt: "
    "describe the subject, motion, camera, lighting, and the synchronized "
    "audio (speech content, ambience, music). Output only the prompt.")


def rewrite_prompt(prompt: str, cfg: Optional[WorkflowConfig] = None,
                   image_b64: Optional[str] = None) -> str:
    """Prompt rewriting (prompt_rewriter_with_image.py behaviour). Falls back
    to the input prompt when no LLM endpoint is configured."""
    cfg = cfg or WorkflowConfig()
    if not cfg.llm_available:
        return prompt
    content = [{"type": "text", "text": prompt}]
    if image_b64:
        content.append({"type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{image_b64}"}})
    try:
        return _chat(cfg, [{"role": "system", "content": REWRITE_SYSTEM},
                           {"role": "user", "content": content}])
    except Exception:
        return prompt


def extract_visual_elements(image_b64: str,
                            cfg: Optional[WorkflowConfig] = None) -> str:
    """Visual-element extraction from the first frame (qwen_vl_api.py role)."""
    cfg = cfg or WorkflowConfig()
    if not cfg.llm_available:
        return ""
    try:
        return _chat(cfg, [{
            "role": "user",
            "content": [
                {"type": "text",
                 "text": "List the key visual elements (people, objects, "
                         "setting, style) of this image, one line each."},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{image_b64}"}},
            ]}])
    except Exception:
        return ""


def generate_first_frame(prompt: str, width: int, height: int,
                         cfg: Optional[WorkflowConfig] = None) -> bytes:
    """Text -> first-frame image via an images endpoint
    (generate_first_frame.py role). Local fallback: a neutral gradient frame
    so the end-to-end workflow still runs without egress."""
    cfg = cfg or WorkflowConfig()
    if cfg.image_gen_available:
        try:
            req = urllib.request.Request(
                cfg.image_api_base.rstrip("/") + "/images/generations",
                data=json.dumps({
                    "model": cfg.image_model, "prompt": prompt,
                    "size": f"{width}x{height}", "response_format": "b64_json",
                }).encode(),
                headers={"Content-Type": "application/json",
                         "Authorization": f"Bearer {cfg.image_api_key}"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return base64.b64decode(json.load(r)["data"][0]["b64_json"])
        except Exception:
            pass
    # offline fallback: deterministic gradient
    import io

    import numpy as np
    from PIL import Image

    y = np.linspace(60, 180, height)[:, None]
    x = np.linspace(80, 200, width)[None, :]
    img = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], axis=-1).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()
