# Test-suite entry points (SURVEY §4 test strategy; split documented in
# README).  The default tier is the CI gate: every push must keep it green
# and it is budgeted to run on a small CPU box.  `test-all` adds the
# heavyweight integration drives (full SLAM sessions, distributed
# subprocess pairs, capacity/scaling sweeps, zero-overlap calibration).

PYTEST ?= python -m pytest

.PHONY: test test-all test-timed bench

test:
	$(PYTEST) tests/ -q -m "not slow"

test-all:
	$(PYTEST) tests/ -q

# CI-style timed run: prints per-module durations so regressions in suite
# wall time are visible (budget: default tier < 5 min warm-cache CPU).
# pytest's summary line carries the total wall time; --durations names
# the offenders.  (`time` is not a dash builtin, so don't rely on it.)
test-timed:
	$(PYTEST) tests/ -q -m "not slow" --durations=25

bench:
	python bench.py
