"""HNSW graph construction: host reference builder, on-device batched
builder, and the partition-and-stitch builder for pod-scale libraries."""

from rad_tpu.build.incremental import insert_into_graph
from rad_tpu.build.partition import build_hnsw_partitioned
from rad_tpu.build.reference import build_hnsw

__all__ = ["build_hnsw", "build_hnsw_partitioned", "insert_into_graph"]
