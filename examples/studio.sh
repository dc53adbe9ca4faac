#!/usr/bin/env bash
# Multi-server studio: one web UI + registry over several serving endpoints
# (counterpart of the reference's SGLANG_SERVERS registry + Streamlit
# selectbox, workflow/config.py:16-29). Each upstream is a scripts/serve.py
# instance (e.g. a 360p and a 720p deployment); the studio proxies /v1 and
# /workflow to the active one and health-checks all of them.
set -euo pipefail
python scripts/workflow_studio.py \
  --servers "${SERVERS:-mova-360p=http://localhost:8000,mova-720p=http://localhost:8001}" \
  --port "${PORT:-8800}" "$@"
