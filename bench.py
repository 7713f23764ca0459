#!/usr/bin/env python
"""Benchmark: decode a real AV1 test vector, report frames/sec.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline reference point: dav1d on one CPU core decodes ~hundreds of fps at
this resolution; vs_baseline is our fps / baseline fps (estimated 300 fps for
the small vectors until a measured dav1d number is available).
"""

import json
import sys
import time

sys.path.insert(0, ".")

VECTOR = "/root/reference/tests/dav1d-test-data/8-bit/issues/324_tennis.ivf"
BASELINE_FPS = 300.0  # placeholder: dav1d-on-one-core estimate for tiny streams


def main():
    try:
        from rav1d_tpu.io.ivf import IvfDemuxer
        from rav1d_tpu.decoder import Decoder, EAgain

        n_frames = 0
        t0 = time.perf_counter()
        dec = Decoder()
        demux = IvfDemuxer(VECTOR)
        for pkt in demux:
            dec.send_data(pkt.data, pkt.timestamp)
            while True:
                try:
                    dec.get_picture()
                    n_frames += 1
                except EAgain:
                    break
        dt = time.perf_counter() - t0
        fps = n_frames / dt if dt > 0 else 0.0
        print(
            json.dumps(
                {
                    "metric": "decode_fps_intra_8bit",
                    "value": round(fps, 3),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / BASELINE_FPS, 4),
                }
            )
        )
    except Exception as e:
        print(
            json.dumps(
                {
                    "metric": "decode_fps_intra_8bit",
                    "value": 0.0,
                    "unit": "frames/sec",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )


if __name__ == "__main__":
    main()
