"""Image-step throughput/MFU vs batch size (VERDICT r4 item 7).

The headline bench pins B=128 (the reference recipe,
``/root/reference/train_image_vae.py:15-19``); this sweeps the same
dSprites AR-VAE training step through bench.py's exact harness at
B ∈ {128, 256, 512, 1024} and prints one JSON line per point with
steps/s, samples/s and MFU against the chip's measured dense-matmul
peak — so RESULTS.md can either adopt a better-MFU batch as a
secondary field or document why B=128 stays the headline.

Run on the real TPU (one TPU process at a time):
    python scripts/bench_image_curve.py [--batches 128,256,512,1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512,1024")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--steps", type=int, default=4096,
                    help="measured steps per window (the full headline "
                         "uses 8192; 4096 halves sweep time at <2% "
                         "median drift)")
    args = ap.parse_args()

    peak_tflops = bench.music_bench_module().measure_peak_matmul_tflops()
    print(json.dumps({"peak_matmul_tflops_measured": round(peak_tflops, 1)}),
          flush=True)
    for b in [int(x) for x in args.batches.split(",")]:
        sps, flops_step = bench.measure_ours(
            bf16=args.bf16, batch=b, measure_steps=args.steps)
        print(json.dumps({
            "batch": b,
            "bf16": args.bf16,
            "steps_per_sec": round(sps, 1),
            "samples_per_sec": round(sps * b, 1),
            "step_ms": round(1e3 / sps, 4),
            "mfu_pct": round(
                flops_step * sps / (peak_tflops * 1e12) * 100.0, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
