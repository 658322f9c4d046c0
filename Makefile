# Convenience targets (the package itself needs no build step; the C
# extension is prebuilt and rebuilt via `make native` only when
# cpp/host_native.cpp changes).

.PHONY: test test-fast native parity-pack bench

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

native:
	python setup.py build_ext --inplace

# Bundle our --log output trees (reference testOxfordDataset.sh.in
# layout, byte-compatible text formats) for offline diff against a
# reference-binary run.  With a dataset: make parity-pack
# OXFORD=/path/to/oxford ; without one, packs synthetic scenes so the
# pack machinery itself stays exercised (CI runs the synthetic form).
OXFORD ?=
parity-pack:
ifeq ($(OXFORD),)
	python tools/parity_pack.py --synthetic 2 --out parity-pack.tgz
else
	python tools/parity_pack.py --images $(OXFORD) --out parity-pack.tgz
endif

bench:
	python bench.py
