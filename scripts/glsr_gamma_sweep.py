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


@click.command()
@click.option("--gammas", default="0.0001,0.001,0.01,0.1",
              help="comma-separated gamma values to sweep")
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
        subprocess.run(cmd, check=True)
        # locate the run's cached metrics via the trainer's own naming
        from arvae_tpu.core.config import TrainerHParams, run_dir, \
            trainer_config_string

        hp = TrainerHParams(lr=1e-4, beta=0.001, capacity=0.0, gamma=g,
                            delta=10.0, rand=rand,
                            reg_type=("rhy_complexity",), reg_dim=(0,))
        rd = run_dir("folk_MeasureVAE" + trainer_config_string(hp) + "GLSR")
        fp = os.path.join(rd, "results_dict.json")
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
        print(f"gamma={g:g}\tacc={m['test_acc']:.4f}\t"
              f"loss={m['test_loss']:.4f}\tinterp={m['interpretability']}")


if __name__ == "__main__":
    main()
