from .mesh import (
    make_mesh, data_model_mesh, shard_leading, replicate, shard_params_tp,
)

__all__ = ["make_mesh", "data_model_mesh", "shard_leading", "replicate",
           "shard_params_tp"]
