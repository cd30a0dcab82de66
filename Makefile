# Convenience targets (the reference's Makefile/CMake equivalents live in
# native/ and tools/golden_gen/; the Python package itself needs no build).

PY ?= python

.PHONY: test native golden bench bench-latency bench-roofline clean

test:
	$(PY) -m pytest tests/ -q

native:
	bash native/build.sh

golden:
	bash tools/golden_gen/build_ref.sh

bench:
	$(PY) bench.py

bench-latency:
	$(PY) tools/bench_latency.py

bench-roofline:
	$(PY) tools/bench_kernel_roofline.py

clean:
	rm -rf native/build tools/golden_gen/build
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
