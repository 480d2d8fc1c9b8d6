# Developer entry points.
.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not cli and not resume"

bench:
	python bench.py

bench-all:
	python tools/bench_all.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
