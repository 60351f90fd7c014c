from .render import render_ansi_core, render_ansi_o2, ANSI256_ARC

__all__ = ["render_ansi_core", "render_ansi_o2", "ANSI256_ARC"]
