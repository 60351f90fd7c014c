from .trace_replay import (
    convert_ui_action, replay_trace, generate_golden_traces, ReplayReport,
)

__all__ = ["convert_ui_action", "replay_trace", "generate_golden_traces",
           "ReplayReport"]
