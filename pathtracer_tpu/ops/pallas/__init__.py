"""Pallas TPU kernels: the fused path-tracing megakernel and helpers."""
