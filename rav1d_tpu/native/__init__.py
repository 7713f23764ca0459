"""ctypes bindings for the native entropy core (native/entropy.c).

The shared library is built on demand with the system C compiler and cached
next to the source; set RAV1D_TPU_NO_NATIVE=1 to force the pure-Python
entropy plane (the correctness anchor the C core is validated against).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "entropy.c")
_SO = os.path.join(_HERE, "..", "..", "native", "libentropy.so")


class MsacState(ctypes.Structure):
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("pos", ctypes.c_size_t),
        ("end", ctypes.c_size_t),
        ("dif", ctypes.c_uint64),
        ("rng", ctypes.c_uint32),
        ("cnt", ctypes.c_int32),
        ("allow_update", ctypes.c_int32),
    ]


class CoefCdfPtrs(ctypes.Structure):
    _fields_ = [
        (name, ctypes.c_void_p)
        for name in (
            "skip", "eob_bin_16", "eob_bin_32", "eob_bin_64", "eob_bin_128",
            "eob_bin_256", "eob_bin_512", "eob_bin_1024", "eob_hi_bit",
            "eob_base_tok", "base_tok", "br_tok", "dc_sign",
        )
    ]


class CoefCallParams(ctypes.Structure):
    _fields_ = [
        ("tdim_lw", ctypes.c_int32),
        ("tdim_lh", ctypes.c_int32),
        ("tdim_w", ctypes.c_int32),
        ("tdim_h", ctypes.c_int32),
        ("tdim_ctx", ctypes.c_int32),
        ("tdim_min", ctypes.c_int32),
        ("tdim_max", ctypes.c_int32),
        ("bdim_lw", ctypes.c_int32),
        ("bdim_lh", ctypes.c_int32),
        ("chroma", ctypes.c_int32),
        ("ss_ver", ctypes.c_int32),
        ("ss_hor", ctypes.c_int32),
        ("ctx_off_idx", ctypes.c_int32),
        ("txtp_mode", ctypes.c_int32),
        ("txtp_fixed", ctypes.c_int32),
        ("skip_txtp", ctypes.c_int32),
        ("idtx_val", ctypes.c_int32),
        ("txtp_cdf", ctypes.c_void_p),
        ("dq_dc", ctypes.c_int32),
        ("dq_ac", ctypes.c_int32),
        ("dq_shift", ctypes.c_int32),
        ("cf_max", ctypes.c_int32),
        ("a", ctypes.c_void_p),
        ("a_off", ctypes.c_int32),
        ("l", ctypes.c_void_p),
        ("l_off", ctypes.c_int32),
        ("skip_ctx_tbl", ctypes.c_void_p),
        ("lo_ctx_offsets", ctypes.c_void_p),
        ("tx_types_per_set", ctypes.c_void_p),
        ("tx_type_class", ctypes.c_void_p),
        ("scan", ctypes.c_void_p),
        ("qm", ctypes.c_void_p),
        ("cf", ctypes.c_void_p),
        ("eob", ctypes.c_int32),
        ("txtp", ctypes.c_int32),
        ("cf_ctx", ctypes.c_int32),
    ]


def _build() -> str | None:
    src = os.path.normpath(_SRC)
    so = os.path.normpath(_SO)
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = [
            "cc", "-O3", "-shared", "-fPIC", "-fvisibility=hidden",
            "-o", so, src,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return so


def _load():
    if os.environ.get("RAV1D_TPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    P = ctypes.POINTER
    lib.msac_init.argtypes = [
        P(MsacState), ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.msac_init.restype = None
    lib.msac_decode_bool_equi.argtypes = [P(MsacState)]
    lib.msac_decode_bool_equi.restype = ctypes.c_uint32
    lib.msac_decode_bool.argtypes = [P(MsacState), ctypes.c_uint32]
    lib.msac_decode_bool.restype = ctypes.c_uint32
    lib.msac_decode_bool_adapt.argtypes = [P(MsacState), ctypes.c_void_p]
    lib.msac_decode_bool_adapt.restype = ctypes.c_uint32
    lib.msac_decode_symbol_adapt.argtypes = [
        P(MsacState), ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.msac_decode_symbol_adapt.restype = ctypes.c_uint32
    lib.msac_decode_hi_tok.argtypes = [P(MsacState), ctypes.c_void_p]
    lib.msac_decode_hi_tok.restype = ctypes.c_uint32
    lib.msac_decode_bools.argtypes = [P(MsacState), ctypes.c_uint32]
    lib.msac_decode_bools.restype = ctypes.c_uint32
    lib.msac_decode_uniform.argtypes = [P(MsacState), ctypes.c_uint32]
    lib.msac_decode_uniform.restype = ctypes.c_uint32
    lib.msac_decode_subexp.argtypes = [
        P(MsacState), ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
    ]
    lib.msac_decode_subexp.restype = ctypes.c_int32
    lib.dav1d_decode_coefs.argtypes = [
        P(MsacState), P(CoefCdfPtrs), P(CoefCallParams),
    ]
    lib.dav1d_decode_coefs.restype = None
    return lib


LIB = _load()
AVAILABLE = LIB is not None
