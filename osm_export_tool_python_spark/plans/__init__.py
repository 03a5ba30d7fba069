"""Plans: session helpers, the end-to-end export pipeline, checkpoints,
manifests."""
