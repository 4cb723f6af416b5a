# Top-level developer workflow.
#
#   make native   build the C++ oracle + native runtime libraries
#   make test     run the full suite (8-device virtual CPU mesh)
#   make bench    run the benchmark on the local accelerator
#   make clean    remove native build artifacts

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C oracle
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py --verbose

clean:
	$(MAKE) -C oracle clean
	$(MAKE) -C native clean
