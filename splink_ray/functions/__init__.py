"""Vectorized scalar/column functions used inside map_batches stages."""
