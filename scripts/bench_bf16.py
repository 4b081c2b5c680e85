"""dSprites AR-VAE training throughput: f32 vs bf16 compute dtype.

The image models run their conv/dense stacks in a configurable compute
dtype (params and the distribution/loss heads stay float32 — the CLIs'
``--bf16``). bfloat16 is the MXU's native input dtype, so if the step
were matmul-bound it would approach 2× f32; if it is launch/HBM-bound
(the 18% MFU regime bench.py measures) the win is smaller. This
measures both through bench.py's exact headline harness (same
DeviceSplit input path, chunked dispatch, median-of-3 windows) and
prints one JSON line.

Run on the real TPU: python scripts/bench_bf16.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    f32, _flops = bench.measure_ours(bf16=False)
    bf16, _ = bench.measure_ours(bf16=True)
    print(json.dumps({
        "dsprites_f32_steps_per_sec": round(f32, 2),
        "dsprites_bf16_steps_per_sec": round(bf16, 2),
        "bf16_speedup": round(bf16 / f32, 3),
        "batch": bench.BATCH,
    }), flush=True)


if __name__ == "__main__":
    main()
