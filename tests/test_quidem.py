"""Quidem qa-corpus conformance sample.

tools/quidem_conformance.py runs the reference's quidem golden corpus
(quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest/*, ~25k
`!ok` query/result cases over the qatests datasets the reference
ships with its own ingest specs) and records every passing case under
tools/quidem_pass/<family>.txt.  This test replays a deterministic
stratified sample per family so regressions in the SQL stack surface
in CI without paying the multi-hour full sweep.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

PASS_DIR = Path(__file__).resolve().parent.parent / "tools" / "quidem_pass"


def _samples(per_family: int = 12) -> dict[str, list[str]]:
    out = {}
    for f in sorted(PASS_DIR.glob("*.txt")) if PASS_DIR.is_dir() else []:
        ids = [ln for ln in f.read_text().splitlines() if ln]
        step = max(1, len(ids) // per_family)
        out[f.stem] = ids[::step][:per_family]
    return out


@pytest.mark.skipif(not PASS_DIR.is_dir(), reason="no quidem pass lists")
def test_quidem_sample(spark, tmp_path):
    import quidem_conformance as qc
    qc.OUTDIR = tmp_path  # keep the full-run results untouched

    failures = []
    for fam, ids in _samples().items():
        npass, nfail, nerr = qc.run([fam], only_ids=ids, spark=spark)
        if nfail or nerr or npass != len(ids):
            failures.append((fam, npass, nfail, nerr, len(ids)))
    assert not failures, failures
