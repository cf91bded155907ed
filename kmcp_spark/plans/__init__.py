"""Physical pipeline plans: staged, checkpointed, resumable."""
