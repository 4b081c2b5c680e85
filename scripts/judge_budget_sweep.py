"""Judge accuracy vs training budget (VERDICT r3 item 8).

The round-2/3 ResNet judge reached 95.2% on the synthetic MNIST set vs
the reference's 96.15% anchor (script_create_result_plots.py:212-213).
This sweep isolates whether the gap is training budget / augmentation
or the synthetic digit distribution itself: run test_mnist.py at
rising epoch budgets with and without ±2px shift augmentation and
tabulate the final validation accuracy per cell. If accuracy plateaus
below the anchor across budgets, the gap is the data; if it closes,
it was capacity.

NOTE: each run overwrites models/MnistRESNET/ — run the best cell last
so the blessed judge checkpoint is the strongest one.

Run: python scripts/judge_budget_sweep.py
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    (5, False),
    (10, False),
    (20, False),
    (10, True),
    (20, True),
]


def run_streamed(cmd):
    """Tee the child's stdout live (a 20-epoch run must show progress,
    and failure diagnostics must not vanish into a discarded
    CalledProcessError)."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    lines = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        lines.append(line)
    return proc.wait(), "".join(lines)


def main():
    rows = []
    for epochs, augment in CELLS:
        cmd = [sys.executable, os.path.join(REPO, "test_mnist.py"),
               "--num_epochs", str(epochs)]
        if augment:
            cmd.append("--augment")
        print("==", " ".join(cmd), flush=True)
        rc, text = run_streamed(cmd)
        if rc != 0:
            rows.append((epochs, augment, None))
            continue
        accs = re.findall(r"accuracy (\d+\.\d+)", text)
        rows.append((epochs, augment, float(accs[-1]) if accs else None))

    print("\n=== judge accuracy vs budget (reference anchor 0.9615) ===")
    for epochs, augment, acc in rows:
        print(f"epochs={epochs}\taugment={augment}\tfinal_val_acc={acc}")


if __name__ == "__main__":
    main()
