"""Execution plans: checkpointed resumable runs, orchestration."""
