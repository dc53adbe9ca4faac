"""Workflow configuration (behavioural reference: workflow/config.py:16-120 —
server endpoint + external LLM API keys via env vars)."""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class WorkflowConfig:
    server_url: str = os.environ.get("DUALFORCE_SERVER_URL", "http://127.0.0.1:8000")
    poll_interval_s: float = float(os.environ.get("DUALFORCE_POLL_INTERVAL", "5"))
    task_timeout_s: float = float(os.environ.get("DUALFORCE_TASK_TIMEOUT", "1800"))
    output_dir: str = os.environ.get("DUALFORCE_OUTPUT_DIR", "./workflow_outputs")

    # External LLM providers (first-frame gen / prompt rewrite). The reference
    # uses Gemini 2.5 Flash Image + DashScope/qwen (workflow/config.py:59-101);
    # any OpenAI-compatible endpoint works here.
    llm_api_base: str = os.environ.get("DUALFORCE_LLM_API_BASE", "")
    llm_api_key: str = os.environ.get("DUALFORCE_LLM_API_KEY", "")
    llm_model: str = os.environ.get("DUALFORCE_LLM_MODEL", "")
    image_api_base: str = os.environ.get("DUALFORCE_IMAGE_API_BASE", "")
    image_api_key: str = os.environ.get("DUALFORCE_IMAGE_API_KEY", "")
    image_model: str = os.environ.get("DUALFORCE_IMAGE_MODEL", "")

    @property
    def llm_available(self) -> bool:
        return bool(self.llm_api_base and self.llm_api_key)

    @property
    def image_gen_available(self) -> bool:
        return bool(self.image_api_base and self.image_api_key)
