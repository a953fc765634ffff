#!/usr/bin/env python
"""Demo launcher (reference run_app.py semantics): checks artifacts exist,
then launches the streamlit app on port 8501 (or falls back to the CLI demo
when streamlit is unavailable)."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REQUIRED = ["saved_models/best_teacher_model.npz", "saved_models/vocab.json"]


def main():
    missing = [p for p in REQUIRED if not os.path.exists(p)]
    if missing:
        print("Missing artifacts (train the teacher first):")
        for p in missing:
            print(f"  {p}")
        sys.exit(1)
    if importlib.util.find_spec("streamlit") is None:
        print("streamlit not installed — use the CLI demo instead:")
        print("  python streamlit_app.py path/to/image.jpg")
        sys.exit(1)
    subprocess.run([sys.executable, "-m", "streamlit", "run",
                    "streamlit_app.py", "--server.port", "8501"],
                   cwd=os.path.dirname(os.path.abspath(__file__)))


if __name__ == "__main__":
    main()
