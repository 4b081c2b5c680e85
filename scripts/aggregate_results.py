"""Aggregate per-run results_dict.json caches into the RESULTS.md
10-seed tables (mean ± std per metric).

Usage: python scripts/aggregate_results.py [--epochs N] <glob> [<glob> ...]
e.g.   python scripts/aggregate_results.py --epochs 30 \
           "models/folk_MeasureVAE_r_*_b_0.001_g_1.0_d_10.0_all_" \
           "models/folk_MeasureVAE_r_*_b_0.001_"

With --epochs N, only caches whose stamped training protocol says
num_epochs == N are aggregated; mismatching or unstamped caches are
listed and EXCLUDED (--allow-unstamped admits legacy pre-stamp caches).
The run-dir name encodes only seed/beta/gamma/delta, so without this
gate a smoke run's cache silently contaminates a blessed protocol
aggregate (ADVICE r4).
"""

import argparse
import glob
import json

import numpy as np

KEYS = ["mig", "SAP_score", "Corr_score", "modularity_score", "test_acc"]


def collect(pattern: str, epochs=None, allow_unstamped=False):
    mets = {}
    n_read = 0
    excluded = []
    for d in sorted(glob.glob(pattern)):
        try:
            r = json.load(open(d + "/results_dict.json"))
        except FileNotFoundError:
            # run dir exists but never finished (no results cache) —
            # it must not count toward the "(n runs)" header
            continue
        if epochs is not None:
            proto = r.get("protocol")
            if proto is None:
                if not allow_unstamped:
                    excluded.append((d, "unstamped"))
                    continue
            elif proto.get("num_epochs") != epochs:
                excluded.append(
                    (d, f"num_epochs={proto.get('num_epochs')}"))
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
    return n_read, mets, excluded


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="require protocol.num_epochs == N")
    ap.add_argument("--allow-unstamped", action="store_true",
                    help="with --epochs, admit caches that predate "
                         "protocol stamping")
    ap.add_argument("patterns", nargs="+")
    args = ap.parse_args()
    for pattern in args.patterns:
        n, mets, excluded = collect(pattern, args.epochs,
                                    args.allow_unstamped)
        print(f"{pattern}  ({n} runs)")
        for d, why in excluded:
            print(f"  EXCLUDED {d}  ({why})")
        for k, v in mets.items():
            print(f"  {k:22s} {np.mean(v):.3f} ± {np.std(v):.3f}  (n={len(v)})")


if __name__ == "__main__":
    main()
