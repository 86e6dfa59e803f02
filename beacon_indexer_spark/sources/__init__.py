"""Sources & sinks: Parquet lake layout, beacon-API fetch layer."""
