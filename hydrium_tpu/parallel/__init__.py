"""Multi-device / multi-host scaling: mesh setup and shard_map'd
encode steps (SURVEY.md sections 2, 5: groups are the data-parallel
axis; histograms are the only cross-shard reduction)."""
