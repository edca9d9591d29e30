"""Device compute ops: intersection, the bounce loop, wavefront pipeline,
and Pallas TPU kernels."""
