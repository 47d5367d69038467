"""Training: losses, optimizers, checkpointing, logging, the SPMD loop."""
