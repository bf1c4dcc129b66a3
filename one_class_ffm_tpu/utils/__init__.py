from .profiling import PhaseTimer, trace_profile

__all__ = ["PhaseTimer", "trace_profile"]
