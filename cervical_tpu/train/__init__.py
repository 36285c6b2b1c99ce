"""Training loops, LR schedules, checkpointing, and callbacks."""
