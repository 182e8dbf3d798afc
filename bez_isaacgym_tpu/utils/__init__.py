"""Config, spaces, seeding, checkpointing, logging, profiling utilities."""
