"""TPU compute kernels (JAX/XLA + Pallas) over padded, masked batches.

This layer replaces the reference's L3 CUDA kernels (SURVEY.md §2.3-§2.11).
Each module pairs a numpy CPU reference implementation (the differential
oracle, mirroring the reference's CPU backends) with a jitted JAX/Pallas
implementation.
"""
