"""Drill window-function conformance sample.

tools/drill_conformance.py runs the reference's full Drill corpus
(sql/src/test/resources/drill/window/, 1,035 cases; the reference
executes it in DrillWindowQueryTest.java) and records every passing
case in tools/drill_pass_list.txt. This test replays a deterministic
stratified sample of that list so regressions in the window stack
surface in CI without paying the full ~10-minute sweep.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

PASS_LIST = Path(__file__).resolve().parent.parent / "tools" / \
    "drill_pass_list.txt"


def _sample(k: int = 45) -> list[str]:
    cases = [ln for ln in PASS_LIST.read_text().splitlines() if ln]
    # stratified: every len(cases)//k-th case, so all families appear
    step = max(1, len(cases) // k)
    return cases[::step][:k]


@pytest.mark.skipif(not PASS_LIST.exists(), reason="no pass list")
def test_drill_window_sample(spark):
    import drill_conformance as dc
    from druid_spark import DruidSparkEngine

    eng = DruidSparkEngine(spark, exact_approx=True)
    dc.register_tables(eng)
    sample = _sample()
    res = _run_cases(eng, dc, sample)
    assert res["fail"] == [] and res["error"] == [], res


def _run_cases(eng, dc, names):
    import re

    from pyspark.sql import functions as F
    out = {"pass": [], "fail": [], "error": []}
    for name in names:
        q = (dc.DRILL / "queries" / f"{name}.q").read_text()
        q = re.sub(r"(?m)^\s*--.*$", "", q)
        e_lines = [ln for ln in
                   (dc.DRILL / "queries" / f"{name}.e").read_text()
                   .split("\n") if ln != ""]
        try:
            df = eng.sql(q)
            sel = []
            for c, t in df.dtypes:
                if t.startswith("timestamp"):
                    sel.append(F.unix_millis(F.col(f"`{c}`")).alias(c))
                elif t == "date":
                    sel.append((F.unix_date(F.col(f"`{c}`"))
                                .cast("long") * 86400000).alias(c))
                else:
                    sel.append(F.col(f"`{c}`"))
            df = df.select(*sel)
            actual = [tuple(dc._norm_actual(v) for v in row)
                      for row in df.collect()]
            expected = dc.parse_expected(e_lines,
                                         [t for _, t in df.dtypes])
            if dc.rows_match(actual, expected,
                             dc.has_top_level_order_by(q)):
                out["pass"].append(name)
            elif name in dc.ORDER_DEPENDENT and \
                    dc.columns_match(actual, expected):
                out["pass"].append(name)
            elif name in dc.ORDER_DEPENDENT_WEAK and dc.columns_match(
                    [tuple(r[i] for i in dc.ORDER_DEPENDENT_WEAK[name])
                     for r in actual],
                    [tuple(r[i] for i in dc.ORDER_DEPENDENT_WEAK[name])
                     for r in expected]):
                out["pass"].append(name)
            else:
                out["fail"].append(name)
        except Exception as ex:
            out["error"].append((name, str(ex).split("\n")[0][:120]))
    return out
