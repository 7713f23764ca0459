#!/usr/bin/env python
"""Benchmark: decode real AV1 test vectors, report frames/sec vs dav1d.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus detail keys (per-vector engine/numpy/syntax fps, engine per-stage
timing, fallback counts). Never hangs, never prints nothing: every
sub-bench runs in a subprocess under its own timeout, and a global alarm
emits the final line even if something wedges.

Baselines: the reference decoder (dav1d C build from /root/reference,
--threads 1, no asm) measured on this machine via tools_py/refbuild:
  - 320x240 8-bit inter, 140 frames: 222 fps
  - 1080p 10-bit, 35 frames: 53 fps
  - 4K 10-bit intra frame (single-frame vector, repeat-decoded): 6.6 fps

The engine (RAV1D_ENGINE=jax) path is ALWAYS attempted with the larger
budget share and retried once: the axon tunnel's first device->host
transfer can wedge a fresh process (engine/run2.py _warm_transfer), so a
hung child is killed and one clean retry is made.
"""

import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/tests/dav1d-test-data"

# (name, vector, frame limit, repeats, dav1d --threads 1 fps on this machine)
# 320p decodes the full 140-frame stream twice: the engine path pays a
# one-time per-process program load (~45-90 s warm via the jax.export +
# XLA caches) that a 24-frame run cannot amortize; dav1d's own benches
# decode whole streams (.github/workflows/build-and-benchmark-x86.yml).
CONFIGS = [
    ("320x240_inter", f"{DATA}/8-bit/data/00000627.ivf", 280, 2, 222.0),
    ("1080p_10bit", f"{DATA}/10-bit/issues/318_tx_4x4.ivf", 8, 1, 53.0),
    ("4k_10bit_intra", f"{DATA}/10-bit/features/itut_t35.ivf", 6, 6, 6.6),
]
PRIMARY = "320x240_inter"
BUDGET_S = float(os.environ.get("RAV1D_BENCH_BUDGET", "700"))

_CHILD = r"""
import hashlib, json, sys, time
sys.path.insert(0, %(root)r)
from rav1d_tpu.decoder import Decoder, EAgain, Settings
from rav1d_tpu.io.ivf import IvfDemuxer

n = 0
t0 = time.perf_counter()
t_first = None
_md5 = hashlib.md5()  # output digest: engine vs numpy must agree


def _got(pic):
    global n, t_first
    for rows in pic.iter_plane_rows():
        _md5.update(rows)
    n += 1
    if t_first is None:
        t_first = time.perf_counter()


# dav1d.c main-loop shape: ONE get per send, then an explicit drain.
# Under the engine's delayed-output ring (decoder._fetch_delay) this keeps
# N frames in flight so device->host fetches batch across frames.
for rep in range(%(reps)d):
    dec = Decoder(Settings(apply_grain=False))
    for pkt in IvfDemuxer(%(vec)r):
        dec.send_data(pkt.data, pkt.timestamp)
        try:
            _got(dec.get_picture())
        except EAgain:
            pass
        if n >= %(limit)d:
            break
    while n < %(limit)d:  # drain the delayed-output ring
        try:
            _got(dec.get_picture())
        except EAgain:
            break
    dec.close()
    if n >= %(limit)d:
        break
dt = time.perf_counter() - t0
steady = (time.perf_counter() - t_first) if (t_first and n > 1) else dt
res = {
    "frames": n, "wall_s": round(dt, 3), "md5": _md5.hexdigest(),
    "first_frame_s": round((t_first - t0), 3) if t_first else None,
    "steady_fps": round((n - 1) / steady, 3) if n > 1 and steady > 0 else 0.0,
    "fps": round(n / dt, 3) if dt > 0 else 0.0,
}
try:
    from rav1d_tpu import engine as _engine
    from rav1d_tpu.engine import run2 as _run2

    if _engine.stats["frames"]:
        res["engine_frames"] = _engine.stats["frames"]
        res["engine_fallback"] = _engine.stats["fallback"]
        res["stage_ms_per_frame"] = {
            k: round(v / max(_engine.stats["frames"], 1), 1)
            for k, v in _run2.stage_ms.items()
        }
except Exception:
    pass
print("RESULT " + json.dumps(res))
"""


_CHILD_SYNTAX = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
from rav1d_tpu.decoder import Decoder, EAgain, Settings
from rav1d_tpu.io.ivf import IvfDemuxer
from rav1d_tpu.recon import frame as _frame

n = [0]
def _noop(f):
    f._dense_args = None
    n[0] += 1
_frame.decode_frame_dense = _noop  # syntax-plane ceiling: skip pixel work

t0 = time.perf_counter()
while n[0] < %(limit)d:
    made = n[0]
    dec = Decoder(Settings(apply_grain=False))
    for pkt in IvfDemuxer(%(vec)r):
        try:
            dec.send_data(pkt.data, pkt.timestamp)
        except Exception:
            pass
        while True:
            try:
                dec.get_picture()
            except EAgain:
                break
            except Exception:
                break
        if n[0] >= %(limit)d:
            break
    if n[0] == made:
        break  # no progress; avoid spinning
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "frames": n[0], "wall_s": round(dt, 3),
    "fps": round(n[0] / dt, 3) if dt > 0 else 0.0,
}))
"""


def _run(code, env, timeout):
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, env=env, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout", "fps": 0.0, "frames": 0}
    for line in (p.stdout or "").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    tail = ((p.stderr or "") + (p.stdout or ""))[-300:]
    return {"error": f"rc={p.returncode}: {tail}", "fps": 0.0, "frames": 0}


def run_syntax_child(vec, limit, timeout):
    """Measure the host C entropy/syntax pass alone (dense pass stubbed):
    the Amdahl ceiling of the two-pass design (SURVEY §2.4.4)."""
    code = _CHILD_SYNTAX % {"root": ROOT, "vec": vec, "limit": limit}
    return _run(code, dict(os.environ), timeout)


_PROBE = r"""
import faulthandler
faulthandler.dump_traceback_later(50, exit=True)
import jax, jax.numpy as jnp, numpy as np
d = jax.device_put(np.arange(64, dtype=np.int32))
v = np.asarray(d * 2)
print("RESULT " + str(int(v[1])))
"""


def probe_tunnel(timeout=70):
    """One tiny h2d+exec+d2h round trip in a throwaway child. The axon
    tunnel's device->host path can be wedged session-wide (killed clients
    poison it); attempting the engine then only wastes budget and worsens
    the wedge."""
    try:
        p = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False
    return any(line.startswith("RESULT 2") for line in (p.stdout or "").splitlines())


def run_child(vec, limit, reps, engine, timeout, retries=0):
    env = dict(os.environ)
    env["RAV1D_ENGINE"] = engine
    code = _CHILD % {"root": ROOT, "vec": vec, "limit": limit, "reps": reps}
    res = _run(code, env, timeout)
    # the tunnel's first d2h transfer can wedge a fresh process; one clean
    # retry distinguishes that flake from a genuinely slow engine
    while retries > 0 and res.get("error") == "timeout":
        retries -= 1
        res = _run(code, env, timeout)
        if "error" not in res:
            res["retried"] = True
    return res


def main():
    t_start = time.perf_counter()
    out = {
        "metric": f"decode_fps_{PRIMARY}",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
    }

    def emit(*_a):
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, emit)
    signal.alarm(int(BUDGET_S) + 20)

    details = {name: {} for name, *_ in CONFIGS}
    out["detail"] = details

    def left():
        return BUDGET_S - (time.perf_counter() - t_start)

    # ---- phase 1: guaranteed numbers FIRST (syntax ceiling + numpy path
    # for every config) so a failing engine attempt can never erase them
    # (round-4 regression: engine timeouts consumed the budget and 1080p/4K
    # reported 0.0) ----
    results_n = {}
    for name, vec, limit, reps, base in CONFIGS:
        d = details[name]
        res_s = run_syntax_child(vec, limit, max(30.0, min(75, left() * 0.12)))
        res_n = run_child(vec, limit, reps, "np",
                          max(45.0, min(150, left() * 0.22)), retries=1)
        results_n[name] = res_n
        d["fps"] = res_n.get("fps", 0.0)
        d["path"] = "numpy"
        d["numpy_fps"] = res_n.get("fps", 0.0)
        d["syntax_fps"] = res_s.get("fps", 0.0)
        d["steady_fps"] = res_n.get("steady_fps", 0.0)
        d["first_frame_s"] = res_n.get("first_frame_s")
        d["frames"] = res_n.get("frames", 0)
        d["vs_dav1d_1core"] = round(res_n.get("fps", 0.0) / base, 5)
        for r, p in ((res_n, "numpy"), (res_s, "syntax")):
            if "error" in r:
                d[f"{p}_error"] = r["error"]
        if name == PRIMARY:
            out["value"] = d["fps"]
            out["vs_baseline"] = d["vs_dav1d_1core"]

    # ---- phase 2: engine path with the remaining budget (primary config
    # first), one retry for tunnel flakes ----
    tunnel_ok = probe_tunnel() if left() > 170 else False
    for name, vec, limit, reps, base in CONFIGS:
        d = details[name]
        if left() <= 160:
            d["engine_fps"] = 0.0
            d["engine_error"] = "budget exhausted"
            continue
        if not tunnel_ok:
            d["engine_fps"] = 0.0
            d["engine_error"] = "tunnel d2h wedged; engine skipped"
            continue
        share = left() / max(
            1, sum(1 for c in CONFIGS if "engine_fps" not in details[c[0]])
        )
        et = max(150.0, min(share * 0.85, left() - 25))
        res_e = run_child(vec, limit, reps, "jax", et,
                          retries=1 if name == PRIMARY else 0)
        e_fps = res_e.get("fps", 0.0)
        d["engine_fps"] = e_fps
        for key in ("engine_fallback", "stage_ms_per_frame", "retried"):
            if key in res_e:
                d[f"engine_{key}" if key == "retried" else key] = res_e[key]
        if "error" in res_e:
            d["engine_error"] = res_e["error"]
        # the engine's number only counts if its output digest matches the
        # (757/757-conformance-verified) host path's on the same workload
        ref_md5 = results_n[name].get("md5")
        if res_e.get("md5") and ref_md5 and res_e["md5"] != ref_md5 \
                and res_e.get("frames") == results_n[name].get("frames"):
            d["engine_error"] = "output digest mismatch vs host path"
            e_fps = 0.0
        if e_fps > 0 and e_fps >= d["numpy_fps"]:
            d["fps"] = e_fps
            d["path"] = "engine"
            d["steady_fps"] = res_e.get("steady_fps", 0.0)
            d["first_frame_s"] = res_e.get("first_frame_s")
            d["frames"] = res_e.get("frames", 0)
            d["vs_dav1d_1core"] = round(e_fps / base, 5)
            if name == PRIMARY:
                out["value"] = e_fps
                out["vs_baseline"] = d["vs_dav1d_1core"]
    signal.alarm(0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
