"""Pipeline assembly, snapshot checkpointing, and lineage metrics."""
