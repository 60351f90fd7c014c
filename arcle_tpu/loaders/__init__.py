from .loader import (
    Loader, ARCLoader, MiniARCLoader, ListLoader, TaskBank, bake_bank,
)
from .synthetic import (
    SyntheticLoader, make_task, make_tasks, write_sample_dataset,
)

__all__ = [
    "Loader", "ARCLoader", "MiniARCLoader", "ListLoader", "TaskBank",
    "bake_bank", "SyntheticLoader", "make_task", "make_tasks",
    "write_sample_dataset",
]
