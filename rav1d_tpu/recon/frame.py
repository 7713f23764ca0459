"""Whole-frame decode driver (parity: src/decode.rs rav1d_decode_frame)."""


def decode_frame(ctx, f):
    raise NotImplementedError("frame decode lands with the syntax+recon layers")
