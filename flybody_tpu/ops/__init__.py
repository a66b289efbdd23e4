"""Pallas TPU kernels for the physics hot ops."""
