"""HNSW graph construction: host reference builder + on-device batched builder."""

from rad_tpu.build.reference import build_hnsw

__all__ = ["build_hnsw"]
