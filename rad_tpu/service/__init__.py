"""HNSW service abstraction: local in-process vs remote HTTP, interchangeable."""

from rad_tpu.service.base import HNSWService
from rad_tpu.service.local import LocalHNSWService
from rad_tpu.service.registry import (
    ServiceRegistry,
    get_default_registry,
    create_local_hnsw_service,
    create_remote_hnsw_service,
)

__all__ = [
    "HNSWService",
    "LocalHNSWService",
    "ServiceRegistry",
    "get_default_registry",
    "create_local_hnsw_service",
    "create_remote_hnsw_service",
]
