"""Run state: per-partition checkpoint manifest, lineage and metrics."""
