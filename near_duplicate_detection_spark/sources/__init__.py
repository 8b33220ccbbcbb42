"""Sources: synthetic pages generator, parquet stage-table catalog."""
