# Development targets (the reference's Makefile builds its CLI + example
# binaries; here the equivalents are the native library, the test suite,
# the examples and the benchmark).

.PHONY: default all native test bench examples clean

default: all
all: native test

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q -m "slow"

test-all:
	python -m pytest tests/ -q -m "slow or not slow"

bench:
	python bench.py

examples:
	python examples/rr.py
	python examples/diode1.py
	python examples/diode2.py
	python examples/bjt.py
	python examples/montecarlo.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
