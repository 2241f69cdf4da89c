"""Device (JAX/Pallas) and host (numpy) compute kernels for the VarDCT
pipeline: color transform, DCT, quantization, context modeling,
tokenization, histograms."""
