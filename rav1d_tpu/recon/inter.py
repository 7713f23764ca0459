"""Inter block reconstruction (parity: src/recon.rs rav1d_recon_b_inter).

Placeholder module: filled in with the MC pipeline (mc/avg/masks/warp/obmc)
in the inter-recon milestone.
"""

from __future__ import annotations


def recon_b_inter(t, f, ts, bs, b):
    raise NotImplementedError("recon_b_inter: inter recon pipeline")
