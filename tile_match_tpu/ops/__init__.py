"""Fixed-shape board kernels (the compute path of the engine)."""
