"""Aggregate per-run results_dict.json caches into the RESULTS.md
10-seed tables (mean ± std per metric).

Usage: python scripts/aggregate_results.py <glob> [<glob> ...]
e.g.   python scripts/aggregate_results.py \
           "models/folk_MeasureVAE_r_*_b_0.001_g_1.0_d_10.0_all_" \
           "models/folk_MeasureVAE_r_*_b_0.001_"
"""

import glob
import json
import sys

import numpy as np

KEYS = ["mig", "SAP_score", "Corr_score", "modularity_score", "test_acc"]


def collect(pattern: str):
    mets = {}
    n_read = 0
    for d in sorted(glob.glob(pattern)):
        try:
            r = json.load(open(d + "/results_dict.json"))
        except FileNotFoundError:
            # run dir exists but never finished (no results cache) —
            # it must not count toward the "(n runs)" header
            continue
        n_read += 1
        for k in KEYS:
            if k in r:
                mets.setdefault(k, []).append(r[k])
        if "interpretability" in r:
            mets.setdefault("interp", []).append(
                r["interpretability"]["mean"][1])
        for k in ("digit_pred_acc",):
            if k in r:
                for sub, v in r[k].items():
                    mets.setdefault(f"{k}.{sub}", []).append(v)
    return n_read, mets


def main():
    for pattern in sys.argv[1:]:
        n, mets = collect(pattern)
        print(f"{pattern}  ({n} runs)")
        for k, v in mets.items():
            print(f"  {k:22s} {np.mean(v):.3f} ± {np.std(v):.3f}  (n={len(v)})")


if __name__ == "__main__":
    main()
