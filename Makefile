# Developer entry points (reference analogue: justfile)
.PHONY: test lint bench native clean

test:
	python -m pytest tests/ -q

# fast subset (no device-engine compile)
test-fast:
	python -m pytest tests/ -q --ignore=tests/test_device_engine.py --ignore=tests/test_sharded.py

bench:
	python bench.py

native:
	python -c "from lrge_tpu.native import HAVE_NATIVE; assert HAVE_NATIVE; print('native ok')"

clean:
	rm -f lrge_tpu/native/_lrge_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
