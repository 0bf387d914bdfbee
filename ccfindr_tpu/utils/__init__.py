from .profiling import profile_trace, Timings  # noqa: F401
