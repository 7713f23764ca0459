"""Out-of-loop film grain application driver (parity: src/fg_apply.rs)."""


def apply_grain(pic):
    raise NotImplementedError("film grain synthesis lands with ops.filmgrain")
