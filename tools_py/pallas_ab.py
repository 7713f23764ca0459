"""A/B: Pallas 8x8 inverse-DCT batch vs its jnp/XLA twin on the real TPU.

Prints one JSON line with per-variant steady-state times (median of
reps, after warmup) and the speedup. Run on the chip:
    python tools_py/pallas_ab.py [batch] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rav1d_tpu.ops.pallas.itx8 import (
        idct8x8_batch_jnp, idct8x8_batch_pallas,
    )

    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.integers(-2048, 2048, (n, 8, 8)), jnp.int32)

    out = {"batch": n, "backend": jax.default_backend()}
    fns = {"pallas": idct8x8_batch_pallas, "jnp": idct8x8_batch_jnp}
    res = {}
    for name, fn in fns.items():
        r = fn(cb, 8)
        r.block_until_ready()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(cb, 8).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[f"{name}_ms"] = round(ts[len(ts) // 2] * 1e3, 3)
        res[name] = np.asarray(r)
    out["bit_exact"] = bool((res["pallas"] == res["jnp"]).all())
    out["speedup"] = round(out["jnp_ms"] / out["pallas_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
