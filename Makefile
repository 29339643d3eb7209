# Convenience targets — the driver calls bench.py / __spark_entry__
# directly; these exist for the per-round records and local iteration.

SF01  ?= /root/testdata/sf0.01
SF1   ?= /root/testdata/sf0.1

.PHONY: strict-record bench test smoke

# Full-registry bit-exact sweeps at both gate scales; paste the two
# N/N lines into README's "standing record" each round.
strict-record:
	python -m tests.strict_compare $(SF01)
	python -m tests.strict_compare $(SF1)

bench:
	python bench.py

test:
	python -m pytest tests/ -q

# fast sanity: entry() + a handful of cheap queries at sf0.001
smoke:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_RUNS=1 \
	SPARK_GRAFT_BENCH_DETAIL=/tmp/bench_smoke.json python bench.py
