"""Probe: does scan-unroll beyond 4 buy anything?

Round 5 adopted `lax.scan(..., unroll=4)` over the dispatch chunk as the
accelerator default (+4.1% music, +5.6% image — logs/r5/unroll.jsonl,
logs/r5/image-unroll.out). This measures the next rungs (8, 16) for both
headline workloads in ONE process so all cells share transport warmup.
Decision criterion as established in docs/design.md: adopt only a
reproducible >1% win; compile-time cost is noted but not gating (the
persistent compile cache amortizes it).

Run on the real TPU (one TPU process at a time):
    python scripts/bench_unroll_hi.py
"""

import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import bench  # noqa: E402


def main():
    out = {"image_batch": bench.BATCH, "music_batch": 256}
    for unroll in (4, 8, 16):
        os.environ["ARVAE_SCAN_UNROLL"] = str(unroll)
        sps, _ = bench.measure_ours(measure_steps=4096)
        out[f"image_unroll{unroll}_steps_per_sec"] = round(sps, 2)
        print(json.dumps({k: out[k] for k in sorted(out)}), flush=True)
    music = bench.music_bench_module()
    for unroll in (4, 8, 16):
        out[f"music_unroll{unroll}_steps_per_sec"] = round(
            music.measure("hier", measure_steps=1536, unroll=unroll), 2)
        print(json.dumps({k: out[k] for k in sorted(out)}), flush=True)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
