"""Query catalog exposed through __spark_entry__.py."""
