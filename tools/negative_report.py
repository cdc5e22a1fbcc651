"""Classify the FULL `!error` negative-conformance corpus results.

Reads a `--errors` run's jsonl (every reference golden case that
EXPECTS an error) and, for each case this engine ACCEPTED (ran
successfully), classifies it:

- capability-superset classes (KEEP — the reference documents these as
  its own limitations, this engine genuinely supports them):
  * range_offset_frame  — RANGE frames with numeric offsets
    (Druid: "The query contains a window frame which may return
    incorrect results" / unsupported RANGE offsets)
  * window_over_mvd     — window functions over multi-value dims
  * unsupported_agg_combo — DISTINCT aggs the reference's planner
    refuses to plan together but Spark plans fine
- should_reject classes (type errors and semantic violations that
  could silently mis-answer) — these are conformance bugs to fix.

Emits tools/quidem_out/negative_accounting.json with per-class counts
+ per-class case samples, and prints the summary.

Usage: python tools/negative_report.py <errors-run.jsonl>
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter, defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from quidem_conformance import FAMILIES, collect_cases  # noqa: E402

OUT = Path(__file__).parent / "quidem_out" / "negative_accounting.json"


def classify(sql: str, expected: str) -> tuple[str, bool]:
    """→ (class, keep): keep=True marks a capability superset."""
    s = sql.upper()
    e = (expected or "").lower()
    if re.search(r"RANGE\s+BETWEEN\s+\d+|RANGE\s+\d+\s+"
                 r"(PRECEDING|FOLLOWING)", s):
        return ("range_offset_frame", True)
    if "window frame" in e or "incorrect results" in e:
        return ("range_offset_frame", True)
    if ("multi-value" in e or "mv_" in e) and re.search(r"\bOVER\b", s):
        return ("window_over_mvd", True)
    if re.search(r"\bOVER\b", s) and re.search(
            r"\bc_mv|\bmv_|_mvd\b|\bdim3\b", sql):
        return ("window_over_mvd", True)
    if "distinct" in e and "aggregat" in e:
        return ("unsupported_agg_combo", True)
    if "cannot be applied" in e or "cannot apply" in e:
        return ("operator_type_error", False)
    if "cast" in e or "convert" in e:
        return ("cast_error", False)
    if "illegal" in e or "invalid" in e:
        return ("invalid_argument", False)
    if "unsupported" in e or "not supported" in e or "unable" in e:
        return ("reference_unsupported", True)
    if "plan" in e:
        return ("reference_planner_refusal", True)
    return ("unclassified", False)


def main(path: str) -> None:
    recs = [json.loads(ln) for ln in open(path)]
    accepted = {r["id"] for r in recs if r["status"] == "mismatch"}
    rejected = sum(1 for r in recs if r["status"] == "pass")
    cases = {c["id"]: c for c in collect_cases(FAMILIES)
             if c["kind"] == "error"}
    counts: Counter = Counter()
    keep_counts: Counter = Counter()
    samples: dict[str, list] = defaultdict(list)
    n_keep = n_fix = 0
    for cid in sorted(accepted):
        c = cases.get(cid)
        if c is None:
            counts["(case-not-found)"] += 1
            continue
        cls, keep = classify(c["sql"], c.get("expected") or "")
        counts[cls] += 1
        if keep:
            keep_counts[cls] += 1
            n_keep += 1
        else:
            n_fix += 1
        if len(samples[cls]) < 5:
            samples[cls].append({
                "id": cid, "sql": c["sql"].strip()[:300],
                "expected_error": (c.get("expected") or "")[:200]})
    out = {
        "total_error_cases_run": len(recs),
        "correctly_rejected": rejected,
        "accepted": len(accepted),
        "accepted_capability_superset": n_keep,
        "accepted_should_investigate": n_fix,
        "by_class": dict(counts),
        "keep_classes": dict(keep_counts),
        "samples": samples,
    }
    OUT.write_text(json.dumps(out, indent=1))
    print(f"error cases run: {len(recs)}; rejected: {rejected}; "
          f"accepted: {len(accepted)} "
          f"(superset {n_keep} / investigate {n_fix})")
    for cls, n in counts.most_common():
        tag = "KEEP" if cls in keep_counts else "FIX?"
        print(f"  {tag} {cls}: {n}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main(sys.argv[1])
