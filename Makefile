.PHONY: all native test test-all bench profile clean

all: native

native:
	$(MAKE) -C native

# fast tier (default; slow-marked tests excluded via pytest.ini addopts)
test: native
	python -m pytest tests/ -q

# full suite including slow/interpret-mode tests
test-all: native
	python -m pytest tests/ -q -m ''

bench:
	python bench.py

profile:
	python -m multi_modal_image_fusion_tpu.models.profile

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
