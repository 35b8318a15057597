"""Regenerate tests/fixtures/golden_spans.json from the frozen oracle.

Run manually after a DELIBERATE semantics change, then hand-review the
diff:  python tests/gen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from batukh_spark.oracle import extract  # noqa: E402
from fixture_corpus import FIXTURES  # noqa: E402


def build_golden():
    rows = []
    for fx in FIXTURES:
        r = extract(fx["text"], role=fx["role"], tool=fx["tool"])
        row = dict(conv_id=fx["conv_id"], turn_idx=fx["turn_idx"],
                   case_family=fx["case_family"], family=r.family,
                   extracted_text=r.extracted_text,
                   error=r.error,
                   spans=[{"start": s, "end": e, "kind": k}
                          for s, e, k in r.spans],
                   lines=[{"line": ln.line, "col": ln.col, "page": ln.page,
                           "x0": ln.x0, "y0": ln.y0, "x1": ln.x1,
                           "y1": ln.y1, "text": ln.text}
                          for ln in r.lines])
        rows.append(row)
    return rows


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_spans.json")
    rows = build_golden()
    with open(out, "w") as f:
        json.dump(rows, f, indent=1, ensure_ascii=False, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(rows)} golden rows -> {out}")
    for r in rows:
        print(f"  {r['conv_id']}/{r['turn_idx']:>2} [{r['case_family']:>10}] "
              f"-> {r['extracted_text'][:60]!r}")
