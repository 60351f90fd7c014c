from .render import render_ansi_core, render_ansi_o2, ANSI256_ARC
from .metrics import MetricLogger, Throughput, profile_trace
from .checkpoint import Checkpointer
from .config import RunConfig, EnvConfig, make_table, make_loader

__all__ = [
    "render_ansi_core", "render_ansi_o2", "ANSI256_ARC",
    "MetricLogger", "Throughput", "profile_trace", "Checkpointer",
    "RunConfig", "EnvConfig", "make_table", "make_loader",
]
