"""Streaming operators: windowed aggregations + stateful dedup, with
batch analogs for oracle checking and readStream parity harnesses."""
