"""Host-side utilities: config, IO, synthetic scenes, metrics, checkpoints."""
