"""Key→SMILES sidecar stores."""

from rad_tpu.store.smiles_store import (
    SmilesStore,
    SQLiteSmilesStore,
    InMemorySmilesStore,
    create_smiles_db,
)

__all__ = [
    "SmilesStore",
    "SQLiteSmilesStore",
    "InMemorySmilesStore",
    "create_smiles_db",
]
