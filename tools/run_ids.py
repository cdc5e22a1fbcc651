"""Run an explicit list of quidem case ids (positive or --errors).

Usage: python tools/run_ids.py ids.txt [--errors]
ids.txt: one case id per line (format <file>:<line>:<table>:<case>).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
from quidem_conformance import FAMILIES, run  # noqa: E402

if __name__ == "__main__":
    ids = [ln.strip() for ln in Path(sys.argv[1]).read_text().splitlines()
           if ln.strip()]
    run(FAMILIES, run_errors="--errors" in sys.argv, only_ids=ids,
        verbose="--verbose" in sys.argv)
