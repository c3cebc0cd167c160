"""Geometry: homography algebra, rotations, focal estimation, scene graph,
canvas math. Device code is JAX (fixed shapes); the tiny-N graph logic is
host-side NumPy."""
