"""NumPy kernels usable inside Arrow-batched pandas UDFs."""
