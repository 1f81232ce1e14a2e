"""Per-partition lineage + resumable partitioned output."""
