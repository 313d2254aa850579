"""spark-submit job entry points (north_rule: run via spark-submit --py-files)."""
