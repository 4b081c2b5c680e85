"""GLSR gamma sweep: find a non-degenerate GLSR model (VERDICT r3 item 6).

The reference GLSR prior is -log N(attr_gradient | 100, 1)
(vae_trainer_glsr.py:45-104): at init the gradient is ~0, so the term
is ~5000 while recon CE is ~3-4 — with the reference's gamma=1 the
regularizer swamps reconstruction and the decoder collapses (the
round-3 blessed run: 7.7% token accuracy vs the 64.4% majority-token
base rate). The capability is faithful; a usable model needs gamma
scaled so the two terms are commensurate. This script sweeps gamma and
reports token accuracy + GLSR loss per cell, so one non-collapsed run
can be blessed into RESULTS.md.

Run (one TPU process at a time):
    python scripts/glsr_gamma_sweep.py [--short] [--epochs 30]
"""

import json
import os
import subprocess
import sys

import click

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_streamed(cmd):
    """Run a child, tee its stdout live, return (returncode, lines).

    A buffered `capture_output=True` run would show nothing for a
    multi-epoch training and discard the diagnostics on failure."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    lines = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        lines.append(line.rstrip("\n"))
    return proc.wait(), lines


@click.command()
@click.option("--gammas", default="0.0001,0.001,0.01,0.1,1.0",
              help="comma-separated gamma values to sweep (1.0 is the "
                   "reference default — retraining it also restores the "
                   "checkpoint the GLSR tester sweep loads)")
@click.option("--epochs", default=30, help="epochs per cell")
@click.option("--short/--full", default=False,
              help="use the small synthetic corpus")
@click.option("--rand", default=0, help="seed")
def main(gammas, epochs, short, rand):
    results = {}
    for g in [float(x) for x in gammas.split(",")]:
        cmd = [
            sys.executable, os.path.join(REPO, "train_measure_vae.py"),
            "--glsr", "-r", "rhy_complexity", "--gamma", str(g),
            "--num_epochs", str(epochs), "--rand", str(rand),
        ]
        if short:
            cmd.append("--short")
        print("== gamma", g, "==", flush=True)
        rc, lines = run_streamed(cmd)
        if rc != 0:
            # partial rows survive a mid-sweep tunnel death
            results[g] = {"error": f"exit {rc}"}
            continue
        # the CLI prints its own run dir — no naming re-derivation here
        run_dirs = [ln.split("run_dir:", 1)[1].strip()
                    for ln in lines if ln.startswith("run_dir:")]
        if not run_dirs:
            results[g] = {"error": "no run_dir line in CLI output"}
            continue
        fp = os.path.join(run_dirs[-1], "results_dict.json")
        with open(fp) as f:
            m = json.load(f)
        results[g] = {
            "test_acc": m.get("test_acc"),
            "test_loss": m.get("test_loss"),
            "interpretability": m.get("interpretability", {}).get(
                "mean", (None, None))[1],
        }
        print(json.dumps({str(g): results[g]}), flush=True)

    print("\n=== sweep summary (majority-token base rate is ~0.644) ===")
    for g, m in sorted(results.items()):
        if "error" in m:
            print(f"gamma={g:g}\t{m['error']}")
        else:
            print(f"gamma={g:g}\tacc={m['test_acc']:.4f}\t"
                  f"loss={m['test_loss']:.4f}\tinterp={m['interpretability']}")


if __name__ == "__main__":
    main()
