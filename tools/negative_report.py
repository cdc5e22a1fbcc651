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


def classify(sql: str, expected: str, case_id: str = "") -> tuple[str, bool]:
    """→ (class, keep): keep=True marks a capability superset."""
    s = sql.upper()
    e = (expected or "").lower()
    if re.search(r"\.(msq|dart)(\.|:)", case_id or "") and (
            "invalid expression" in e or "cannot" in e
            or "unsupported" in e or "not supported" in e):
        # .msq/.dart quidem files record the MSQ/Dart ENGINE variants'
        # rejections; this engine models the standard interactive
        # engine, which accepts these shapes (same documented skip
        # class as the positive-corpus engine variants)
        return ("msq_dart_engine_variant", True)
    if re.search(r"(?i)\b(left|right|strlen|strpos|reverse|repeat|"
                 r"textcat|contains_string|icontains_string|"
                 r"ipv4_\w+|ipv6_\w+|parse_long|time_parse|greatest|"
                 r"least|lpad|rpad|lower|upper|substring|concat|"
                 r"parse_json|try_parse_json|bit_and|bit_or|bit_xor|"
                 r"approx_count_distinct(?:_builtin)?|unnest)\s*\(\s*"
                 r"(?:a_null|a_empty|a_str|c_mv_\w*|a_mixed)\b", sql) \
            and "cannot apply" in e:
        # scalar fn over a STRING-element array column: this engine
        # stores MVDs and string arrays both as array<string>, so the
        # validator cannot tell the (legal) MVD element-mapping apart
        # from the (illegal) typed-array call — documented storage
        # ambiguity, the function still evaluates element-wise
        return ("string_array_vs_mvd_ambiguity", True)
    if "framing of first_value/last_value" in e:
        # Calcite refuses offset frames on FIRST/LAST_VALUE
        # (qaWin orderby_* _first_last !error families); Spark
        # evaluates them with standard framed semantics.  r13: the
        # opt-in `SET strictWindowFrames = true` raises the
        # reference's refusal spelling for drop-in compatibility
        # (sqlshim._strict_window_frames_check) — the default stays
        # the capability superset
        return ("first_last_offset_frame", True)
    if e.strip() in ("size", "['size']") or "exceeds" in e \
            or (e.strip().lower().startswith("not enough")
                and "capacity" not in e):
        # resource-guard errors: the reference's default byte caps
        # (ARRAY_AGG/STRING_AGG maxSizeBytes 1024) and aggregation
        # buffer capacity ("Not enough ..." — eight 100 KB array_agg
        # reservations) — this engine's collectors are unbounded by
        # documented design
        return ("reference_size_limit", True)
    if re.search(r"RANGE\s+BETWEEN\s+\d+|RANGE\s+\d+\s+"
                 r"(PRECEDING|FOLLOWING)", s):
        # r13: `SET strictWindowFrames = true` opts in to the
        # reference's refusal for these too (default: superset)
        return ("range_offset_frame", True)
    if "window frame" in e or "incorrect results" in e \
            or "frame" in e:
        return ("range_offset_frame", True)
    if ("multi-value" in e or "mv_" in e) and re.search(r"\bOVER\b", s):
        return ("window_over_mvd", True)
    if re.search(r"\bOVER\b", s) and re.search(
            r"\bc_mv|\bmv_|_mvd\b|\bdim3\b", sql):
        return ("window_over_mvd", True)
    if "distinct" in e and "aggregat" in e:
        return ("unsupported_agg_combo", True)
    if ("queryinterruptedexception" in e or "querynotsupported" in e
            or "cannotbuildqueryexception" in e
            or "druidexception" in e
            or "not enough capacity" in e):
        # the reference's own runtime/planner bails on these shapes
        # (its window/join/subquery engines refuse or interrupt);
        # this engine executes them — capability superset
        return ("reference_runtime_refusal", True)
    if "cannot join" in e or "requires union" in e \
            or "not support" in e:
        # join/union shapes outside the reference's datasource model
        return ("reference_unsupported", True)
    if "rank or dense_rank functions require order by" in e:
        # deliberate deviation: the drill corpus (also shipped by the
        # reference) REQUIRES evaluating rank over unordered windows;
        # the injected ORDER BY true serves both
        return ("rank_without_order_by", True)
    if e.strip().lower() == "array" and re.search(
            r"(?i)\b(?:a_null|a_empty|a_str|c_mv_\w*)\s+(?:NOT\s+)?"
            r"IN\s*\(\s*SELECT\b", sql):
        # string-element array in an IN subquery: MVDs publish as
        # VARCHAR in the reference and are LEGAL there, so the guard
        # covers only provably-real arrays — string-element arrays
        # stay ambiguous with MVDs (same documented storage ambiguity)
        return ("string_array_vs_mvd_ambiguity", True)
    if e.strip() == "ARRAY" or "order by" in e and "array" in e:
        return ("array_ordering_superset", True)
    if "cannot be applied" in e or "cannot apply" in e:
        # array functions over UNNESTED scalars: the scalar auto-wrap
        # exists because the corpus's POSITIVE goldens require it
        # (qaUnnest array_length(c_long) batteries) — the same wrap
        # accepts these; the reference is inconsistent between its
        # own !ok and !error families here
        if re.search(r"\bARRAY_|\bMV_", s):
            return ("scalar_autowrap_superset", True)
        return ("operator_type_error", False)
    if "cannot convert" in e and re.search(r"CAST\s*\(", s):
        # casts of typed arrays to VARCHAR render here (the MV
        # coercion path requires array→string casts the reference
        # rejects in this spelling)
        return ("array_cast_render_superset", True)
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
        exp = c.get("expected") or ""
        if isinstance(exp, list):
            exp = "\n".join(str(x) for x in exp)
        cls, keep = classify(c["sql"], exp, cid)
        counts[cls] += 1
        if keep:
            keep_counts[cls] += 1
            n_keep += 1
        else:
            n_fix += 1
        if len(samples[cls]) < 5:
            samples[cls].append({
                "id": cid, "sql": c["sql"].strip()[:300],
                "expected_error": str(c.get("expected") or "")[:200]})
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
