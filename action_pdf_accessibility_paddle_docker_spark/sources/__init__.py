"""Sources: deterministic synthetic transcript generation and table readers."""
