"""Auxiliary subsystems: checkpointing, profiling, native bindings,
visualization (SURVEY.md §5)."""
