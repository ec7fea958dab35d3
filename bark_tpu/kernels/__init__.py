"""Pallas TPU kernels for the hot paths.

- decode: fused single-token GPT decode (the autoregressive bottleneck)
- quant: blocked-quantized matmul utilities (q4/q5/q8 serving path)
"""
