# Convenience targets (reference equivalents: tests/run_tests.sh,
# tests/reinstall_and_test.sh, tests/benchmark.sh)

.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

native:
	g++ -O3 -march=native -shared -fPIC \
	  -o pygemma_tpu/native/libpygemma_io.so \
	  pygemma_tpu/native/bed_reader.cpp -lpthread

clean:
	rm -rf .bench_cache pygemma_tpu/native/*.so **/__pycache__
