"""User-facing API: HNSWIndex builder facade + RADTraverser lifecycle."""

from rad_tpu.api.index import HNSWIndex
from rad_tpu.api.traverser import RADTraverser
from rad_tpu.api.factories import (
    create_local_traverser,
    create_distributed_traverser,
    create_remote_traverser,
    create_pod_traverser,
)

__all__ = [
    "HNSWIndex",
    "RADTraverser",
    "create_local_traverser",
    "create_distributed_traverser",
    "create_remote_traverser",
    "create_pod_traverser",
]
