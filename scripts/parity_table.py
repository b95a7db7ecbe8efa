"""Side-by-side parity table: our metrics.json vs reference headline numbers.

The quality gate from BASELINE.json ("reproduce reference validity/QED/SA and
geometry metrics within tolerance on CrossDocked2020") fires here: every
non-null reference entry is compared with its tolerance; --strict exits 1 if
any gated metric misses. Reference values ship in
assets/reference_metrics/*.json with per-entry sources (values the paper
tables hold but that are not redistributable in-tree are null and skipped).

Usage:
  python scripts/parity_table.py --metrics results/parity/metrics.json \
      [--reference assets/reference_metrics/targetdiff_crossdocked.json] \
      [--out results/parity/parity_table.md] [--strict]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def derive(metrics: dict) -> dict:
    """Add derived fields the paper tables use."""
    out = dict(metrics)
    sa = metrics.get("sa_mean")
    if sa is not None and not (isinstance(sa, float) and math.isnan(sa)):
        # papers report normalized SA in [0,1]: (10 - raw_sascore) / 9
        out["sa_norm"] = (10.0 - float(sa)) / 9.0
    return out


def compare(ours: dict, ref: dict):
    rows = []
    n_pass = n_fail = n_skip = 0
    for key, spec in ref["metrics"].items():
        rv = spec.get("value")
        tol = spec.get("tolerance", 0.0)
        direction = spec.get("direction", "higher")
        ov = ours.get(key)
        if isinstance(ov, float) and math.isnan(ov):
            ov = None
        if rv is None or ov is None:
            status = "—"
            n_skip += 1
        else:
            # "higher is better": pass if ours >= ref - tol;
            # "lower is better": pass if ours <= ref + tol
            good = (ov >= rv - tol) if direction == "higher" \
                else (ov <= rv + tol)
            status = "PASS" if good else "FAIL"
            n_pass += good
            n_fail += not good
        rows.append((key, ov, rv, tol, direction, status,
                     spec.get("source", "")))
    return rows, n_pass, n_fail, n_skip


def render(rows, n_pass, n_fail, n_skip, metrics_path, ref_path) -> str:
    fmt = lambda v: "–" if v is None else f"{v:.4g}"  # noqa: E731
    lines = [
        "# Quality-parity table",
        "",
        f"ours: `{metrics_path}`  ·  reference: `{ref_path}`",
        "",
        "| metric | ours | reference | tol | better | gate | source |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, ov, rv, tol, direction, status, source in rows:
        lines.append(f"| {key} | {fmt(ov)} | {fmt(rv)} | ±{tol} "
                     f"| {direction} | {status} | {source} |")
    lines += ["",
              f"**{n_pass} pass / {n_fail} fail / {n_skip} ungated** "
              "(ungated = reference value or our measurement unavailable)"]
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--reference",
                    default=os.path.join(
                        os.path.dirname(__file__), "..", "assets",
                        "reference_metrics", "targetdiff_crossdocked.json"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any gated metric fails")
    args = ap.parse_args(argv)

    with open(args.metrics) as f:
        ours = derive(json.load(f))
    with open(args.reference) as f:
        ref = json.load(f)

    rows, n_pass, n_fail, n_skip = compare(ours, ref)
    text = render(rows, n_pass, n_fail, n_skip, args.metrics, args.reference)
    print(text)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text)
    if args.strict and n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
