"""Workflow configuration (behavioural reference: workflow/config.py:16-120 —
server endpoint + external LLM API keys via env vars)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str = ""):
    # default_factory: read the environment at INSTANTIATION time, not at
    # import time — launchers commonly set os.environ after imports
    return field(default_factory=lambda: os.environ.get(name, default))


def _env_float(name: str, default: str):
    return field(default_factory=lambda: float(os.environ.get(name, default)))


@dataclass
class WorkflowConfig:
    server_url: str = _env("DUALFORCE_SERVER_URL", "http://127.0.0.1:8000")
    poll_interval_s: float = _env_float("DUALFORCE_POLL_INTERVAL", "5")
    task_timeout_s: float = _env_float("DUALFORCE_TASK_TIMEOUT", "1800")
    output_dir: str = _env("DUALFORCE_OUTPUT_DIR", "./workflow_outputs")

    # External LLM providers (first-frame gen / prompt rewrite). The reference
    # uses Gemini 2.5 Flash Image + DashScope/qwen (workflow/config.py:59-101);
    # any OpenAI-compatible endpoint works here.
    llm_api_base: str = _env("DUALFORCE_LLM_API_BASE")
    llm_api_key: str = _env("DUALFORCE_LLM_API_KEY")
    llm_model: str = _env("DUALFORCE_LLM_MODEL")
    image_api_base: str = _env("DUALFORCE_IMAGE_API_BASE")
    image_api_key: str = _env("DUALFORCE_IMAGE_API_KEY")
    image_model: str = _env("DUALFORCE_IMAGE_MODEL")

    @property
    def llm_available(self) -> bool:
        return bool(self.llm_api_base and self.llm_api_key)

    @property
    def image_gen_available(self) -> bool:
        return bool(self.image_api_base and self.image_api_key)
