"""Pallas TPU kernels: hand-scheduled versions of the hottest stable-shape
dense ops. Each kernel has a jnp twin in ops/tpu (bit-exact parity tested)
and an A/B harness (tools_py/pallas_ab.py) measuring it against that twin
on the real chip."""
