"""Device-side numeric kernels (JAX/XLA/Pallas), all fixed-shape."""
