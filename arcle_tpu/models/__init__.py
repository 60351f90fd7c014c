from .truncated_normal import TruncatedNormal
from . import bbox_dist
from .gpt import GPTPolicy, GPTConfig
from .mlp import (
    FCPolicy, WLinear, HyperMLP,
    multi_categorical_sample, multi_categorical_log_prob,
    multi_categorical_entropy,
)

__all__ = [
    "TruncatedNormal", "bbox_dist", "GPTPolicy", "GPTConfig",
    "FCPolicy", "WLinear", "HyperMLP",
    "multi_categorical_sample", "multi_categorical_log_prob",
    "multi_categorical_entropy",
]
