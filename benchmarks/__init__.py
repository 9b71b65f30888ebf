"""Benchmark harnesses (run as scripts: python benchmarks/<name>.py)."""
