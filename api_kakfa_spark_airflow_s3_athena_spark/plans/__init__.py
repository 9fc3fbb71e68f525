"""Query plans: the reference's Athena SQL surface plus the full
analytical / training-data-pipeline extension, each as a DataFrame
builder paired with a DuckDB oracle SQL string."""
