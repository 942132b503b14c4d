"""Ray Data stages: batch transforms and actor-pool callables."""
