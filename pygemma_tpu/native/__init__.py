"""Native (C++) IO kernels, built on demand and loaded via ctypes.

Python falls back to vectorized NumPy implementations when the toolchain is
unavailable, so the package never hard-fails without a compiler.
"""
