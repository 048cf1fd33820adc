"""Training-data pipeline operators: deterministic splits, domain mixing,
PII redaction, sequence packing (see dataset.py)."""
