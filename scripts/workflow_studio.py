"""Launch the multi-server studio UI (behavioural reference:
workflow/config.py SGLANG_SERVERS + workflow/launch_streamlit.sh — one
front-end over several model servers, e.g. a 360p and a 720p deployment).

Usage:
    python scripts/workflow_studio.py \\
        --servers mova-360p=http://host-a:8000,mova-720p=http://host-b:8000
    # or: DUALFORCE_SERVERS="mova-360p=http://...,..." python scripts/workflow_studio.py
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--servers", type=str,
                    default=os.environ.get("DUALFORCE_SERVERS", ""),
                    help='"name=url,name=url" registry of DualForce servers')
    ap.add_argument("--active", type=str, default=None,
                    help="initially selected server (default: first)")
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8800)
    args = ap.parse_args()

    from dualforce_tpu.workflow.studio import Studio, parse_servers

    Studio(parse_servers(args.servers), active=args.active).run(
        host=args.host, port=args.port)


if __name__ == "__main__":
    main()
