"""Query plans: the driver-contract catalog mapping SURVEY §2 operators onto
the shared test tables, each with a DuckDB oracle."""
