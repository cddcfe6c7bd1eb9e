"""Shared utilities: options/env config, tracing spans."""

from .logger import span, spans_report
from .opts import ZKMCoreOpts

__all__ = ["ZKMCoreOpts", "span", "spans_report"]
