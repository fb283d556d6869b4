# Round artifacts — run before handing a round to the judge.
#
#   make verify ROUND=5   → ORACLE_FULL_r5.txt: every queries() entry
#                           vs its DuckDB oracle at sf0.01, per-query
#                           PASS/FAIL + timing (the full-registry run
#                           the judge previously had to re-execute)
#   make bench            → BENCH_FULL.json + the one-line contract
#   make test             → pytest suite

ROUND ?= 5
SF_DIR ?= /root/testdata/sf0.01

.PHONY: verify bench test

verify:
	python tools/verify_oracle.py $(SF_DIR) 2>&1 | tee ORACLE_FULL_r$(ROUND).txt

bench:
	python bench.py

test:
	python -m pytest tests/ -q
