"""Custom Python Data Source API connectors (PySpark ≥ 4.0)."""
