"""Low-level TPU ops: Pallas kernels and XLA compute primitives."""
