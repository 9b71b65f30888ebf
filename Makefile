# Convenience targets. The test suite runs on a virtual 8-device CPU
# mesh (tests/conftest.py); bench needs the real TPU chip.

.PHONY: test check-docs fix-docs bench

test:
	python -m pytest tests/ -x -q

# Verify README's self-reported numbers (test count, headline
# tokens/sec mentions) against pytest collection + the latest BENCH
# artifact (VERDICT r4 #8). fix-docs rewrites the test count in place.
check-docs:
	python scripts/check_readme_numbers.py

fix-docs:
	python scripts/check_readme_numbers.py --fix

bench:
	python bench.py
