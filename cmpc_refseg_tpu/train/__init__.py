"""Training/eval harness: optimizer, trainer, evaluator, checkpointing."""
