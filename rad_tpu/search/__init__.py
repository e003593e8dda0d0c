"""Batched k-NN queries over a built HNSW graph."""

from rad_tpu.search.knn import search_device

__all__ = ["search_device"]
