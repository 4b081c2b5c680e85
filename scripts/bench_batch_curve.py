"""Samples/sec vs batch size for the MeasureVAE training step
(VERDICT r3 item 4).

Round 3 measured a non-monotonicity: B=1024 fused ran 251 steps/s
(257k samples/s) vs B=512's 289k samples/s. This sweeps
B ∈ {256, 512, 1024, 2048} on both the fused Pallas path and the XLA
scan fallback and prints one JSON line per cell, so the cause (per-beat
streamed conditioning cost vs plain MXU shape effects) can be read off
the curve: if the fallback shows the same dip, it's not the kernel's
streaming.

Each row records ``fused_active`` — whether the fused decoder kernel
actually engaged — because the kernel's own VMEM guard rejects some
shapes regardless of the request (B=2048/H=128 models ~21.5 MB > the
15 MB budget), and a mislabeled row would defeat the attribution.

Run on the real TPU (one TPU process at a time):
    python scripts/bench_batch_curve.py [--steps 1024]
"""

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)

import bench_measure_vae as bmv  # noqa: E402

from arvae_tpu.ops import hier_decoder_pallas  # noqa: E402

MEASURE_SEQ_LEN = 24
HIDDEN, LAYERS = 128, 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--batches", default="256,512,1024,2048")
    ap.add_argument("--ablate", default="none", choices=["none", "noreg"],
                    help="noreg drops the O(B^2) pairwise AR-reg term — "
                    "isolates whether the per-sample dip at large B is "
                    "the quadratic reg cost")
    ap.add_argument("--fused-only", action="store_true")
    args = ap.parse_args()

    for fused in ((True,) if args.fused_only else (True, False)):
        os.environ.pop("ARVAE_NO_GRU_PALLAS", None)
        if not fused:
            os.environ["ARVAE_NO_GRU_PALLAS"] = "1"
        for b in [int(x) for x in args.batches.split(",")]:
            active = hier_decoder_pallas.enabled(
                b, HIDDEN, LAYERS, bmv.VOCAB_SIZE, MEASURE_SEQ_LEN, "argmax")
            slices = hier_decoder_pallas.fused_slices(
                b, HIDDEN, LAYERS, bmv.VOCAB_SIZE, MEASURE_SEQ_LEN, "argmax")
            try:
                sps = bmv.measure("hier", batch=b, measure_steps=args.steps,
                                  ablate=args.ablate)
                print(json.dumps({
                    "batch": b,
                    "fused_requested": fused,
                    "fused_active": active,
                    "fused_slices": slices if (fused and active) else 0,
                    "ablate": args.ablate,
                    "steps_per_sec": round(sps, 2),
                    "samples_per_sec": round(sps * b, 0),
                }), flush=True)
            except Exception as e:
                import sys as _sys
                import traceback
                traceback.print_exc(file=_sys.stderr)
                print(json.dumps({
                    "batch": b, "fused_requested": fused,
                    "fused_active": active,
                    "error": repr(e)[:2000],
                }), flush=True)


if __name__ == "__main__":
    main()
