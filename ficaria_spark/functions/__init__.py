"""Driver-side numeric kernels (pure NumPy) + Spark-side vectorized helpers."""
