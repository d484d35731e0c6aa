"""Compare two ``video_scores.json`` files against the 1e-3 parity budget.

The drop-day acceptance command (MIGRATION.md §6): after scoring TAG-Bench
with converted reference checkpoints, ONE invocation decides the north-star
parity claim against the reference's own ``eval.py`` output
(ref ``eval.py:439-453`` for the schema ``{vid: {ac, tc}}``):

    python scripts/compare_scores.py ours.json reference.json --tol 1e-3

Keys are matched exactly first, then by the reference's normalized-name rule
(``utils/names.py::norm_name`` — the same normalization ``eval.py:289-294``
applies before correlating). Exit 0 iff every matched video's |dAC| and
|dTC| are within ``--tol`` and no video is unmatched on either side.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_gen_evals_tpu.utils.names import norm_name  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--top", type=int, default=10,
                   help="how many worst videos to print")
    args = p.parse_args(argv)

    with open(args.ours) as f:
        ours = json.load(f)
    with open(args.reference) as f:
        ref = json.load(f)

    norm_ref = {norm_name(k): k for k in ref}
    pairs, unmatched = [], []
    for k in ours:
        if k in ref:
            pairs.append((k, k))
        elif norm_name(k) in norm_ref:
            pairs.append((k, norm_ref[norm_name(k)]))
        else:
            unmatched.append(k)
    matched_ref = {r for _, r in pairs}
    ref_only = [k for k in ref if k not in matched_ref]

    rows = []
    for ko, kr in pairs:
        for metric in ("ac", "tc"):
            if metric in ours[ko] and metric in ref[kr]:
                d = abs(float(ours[ko][metric]) - float(ref[kr][metric]))
                rows.append((d, ko, metric))
            elif (metric in ours[ko]) != (metric in ref[kr]):
                rows.append((float("inf"), ko, f"{metric}(one-sided)"))
    rows.sort(reverse=True)

    worst = rows[0][0] if rows else 0.0
    print(f"matched {len(pairs)} videos, {len(rows)} metric pairs; "
          f"max |delta| = {worst:g} (tol {args.tol:g})")
    for d, k, m in rows[: args.top]:
        flag = "OVER" if d > args.tol else "ok"
        print(f"  {flag:>4}  {d:.3e}  {k}:{m}")
    if unmatched:
        print(f"UNMATCHED in ours ({len(unmatched)}): {unmatched[:10]}")
    if ref_only:
        print(f"UNMATCHED in reference ({len(ref_only)}): {ref_only[:10]}")

    ok = worst <= args.tol and not unmatched and not ref_only
    print("PARITY: PASS" if ok else "PARITY: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
