"""Observability utilities: profiling traces, step timing, jsonl metrics."""

from s1s2.utils.profiling import StepTimer, trace_context, MetricsLogger

__all__ = ["StepTimer", "trace_context", "MetricsLogger"]
