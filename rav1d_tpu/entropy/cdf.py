"""Adaptive CDF contexts (stub — full tables land with the entropy core).

Parity target: src/cdf.rs (CdfContext, rav1d_cdf_thread_init_static,
rav1d_cdf_thread_update).
"""


class CdfContext:
    @classmethod
    def from_qindex(cls, qidx: int) -> "CdfContext":
        raise NotImplementedError("CDF tables land with the entropy core")
