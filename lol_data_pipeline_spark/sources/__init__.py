"""Sources: parameterized scans, rate-limited fan-out fetch, ingest."""
