"""Batched numerical kernels: linear algebra, sampling, scoring, labeling."""
