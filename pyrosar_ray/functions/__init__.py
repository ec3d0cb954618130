"""Stateless scalar/vector kernels used inside map_batches stages."""
