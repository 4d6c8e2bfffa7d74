"""Host-side utilities: trace formatting, checkpointing, profiling."""
