"""Probe: does scan-unroll help the dSprites image headline too?

The music headline gained +4.1% from `lax.scan(..., unroll=4)` over the
64-step dispatch chunk (logs/r5/unroll.jsonl); this measures the same
knob on the image step (DeviceEpochRunner reads ARVAE_SCAN_UNROLL at
construction) in ONE process so the two cells share transport warmup.
Decides whether the framework default should move to 4 (the trajectory
is bit-identical either way — tests/test_device_data.py pins that).

Run on the real TPU (one TPU process at a time):
    python scripts/bench_image_unroll.py
"""

import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import bench  # noqa: E402


def main():
    out = {"batch": bench.BATCH}
    for unroll in (1, 4):
        os.environ["ARVAE_SCAN_UNROLL"] = str(unroll)
        sps, _ = bench.measure_ours(measure_steps=4096)
        out[f"dsprites_unroll{unroll}_steps_per_sec"] = round(sps, 2)
    out["unroll4_speedup"] = round(
        out["dsprites_unroll4_steps_per_sec"]
        / out["dsprites_unroll1_steps_per_sec"], 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
