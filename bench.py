#!/usr/bin/env python
"""Benchmark: decode a real AV1 inter-coded test vector, report frames/sec.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference decoder (dav1d C build, --threads 1) measured on this
machine on the same vector and frame limit: ~220 fps (320x240 inter,
8-bit/data/00000627.ivf, first 24 frames; median of 3 runs).
"""

import json
import sys
import time

sys.path.insert(0, ".")

VECTOR = "/root/reference/tests/dav1d-test-data/8-bit/data/00000627.ivf"
LIMIT = 24
BASELINE_FPS = 220.0  # dav1d C single-thread, same vector+limit, this machine


def main():
    try:
        from rav1d_tpu.decoder import Decoder, EAgain, Settings
        from rav1d_tpu.io.ivf import IvfDemuxer

        dec = Decoder(Settings(apply_grain=False))
        demux = IvfDemuxer(VECTOR)
        n_frames = 0
        t0 = time.perf_counter()
        for pkt in demux:
            dec.send_data(pkt.data, pkt.timestamp)
            while True:
                try:
                    dec.get_picture()
                    n_frames += 1
                except EAgain:
                    break
            if n_frames >= LIMIT:
                break
        dt = time.perf_counter() - t0
        fps = n_frames / dt if dt > 0 else 0.0
        print(
            json.dumps(
                {
                    "metric": "decode_fps_320x240_inter",
                    "value": round(fps, 3),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / BASELINE_FPS, 5),
                }
            )
        )
    except Exception as e:  # noqa: BLE001 — bench must always emit one line
        print(
            json.dumps(
                {
                    "metric": "decode_fps_320x240_inter",
                    "value": 0.0,
                    "unit": "frames/sec",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )


if __name__ == "__main__":
    main()
