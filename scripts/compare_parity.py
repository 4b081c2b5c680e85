"""Compare two directories of seed runs metric-by-metric (f32 vs bf16
convergence parity, VERDICT r4 item 3).

Each directory holds run dirs written by train_image_vae.py under a
dedicated ARVAE_MODELS_DIR (so parity runs can never contaminate the
blessed caches in models/). Prints one JSON line with per-metric
mean±std for both arms and the deltas.

Usage: python scripts/compare_parity.py <dir_a> <dir_b> [--label-a f32]
"""

import argparse
import glob
import json
import os

import numpy as np


def collect(root):
    """metric -> list of seed values, flattened from results_dict.json."""
    out = {}
    for fp in sorted(glob.glob(os.path.join(root, "*", "results_dict.json"))):
        d = json.load(open(fp))
        flat = {}
        for k, v in d.items():
            if k == "protocol":
                continue
            if isinstance(v, dict):  # interpretability: {attr: [dim, score]}
                for a, pair in v.items():
                    flat[f"{k}/{a}"] = float(pair[1] if isinstance(
                        pair, (list, tuple)) else pair)
            elif isinstance(v, (int, float)):
                flat[k] = float(v)
        for k, v in flat.items():
            out.setdefault(k, []).append(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--label-a", default="f32")
    ap.add_argument("--label-b", default="bf16")
    args = ap.parse_args()

    a, b = collect(args.dir_a), collect(args.dir_b)
    report = {"n_runs": {args.label_a: 0, args.label_b: 0}, "metrics": {}}
    if a:
        report["n_runs"][args.label_a] = max(len(v) for v in a.values())
    if b:
        report["n_runs"][args.label_b] = max(len(v) for v in b.values())
    for k in sorted(set(a) & set(b)):
        ma, sa = float(np.mean(a[k])), float(np.std(a[k]))
        mb, sb = float(np.mean(b[k])), float(np.std(b[k]))
        report["metrics"][k] = {
            args.label_a: [round(ma, 4), round(sa, 4)],
            args.label_b: [round(mb, 4), round(sb, 4)],
            "delta": round(mb - ma, 4),
            # parity verdict: |delta| within 1 pooled std of the seed
            # noise (or both arms agree to 3 decimals)
            "within_seed_noise": bool(
                abs(mb - ma) <= max(sa, sb, 1e-3)),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
