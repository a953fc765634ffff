"""Runtime utilities: checkpointing, logging, profiling."""
