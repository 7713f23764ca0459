"""DSP kernels (TPU dense plane): itx, ipred, mc, loopfilter, cdef, lr, filmgrain.

Each family has a numpy reference implementation in ops.ref (the
checkasm-style oracle) and a JAX/Pallas TPU implementation.
"""
