.PHONY: all native test bench profile clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

profile:
	python -m multi_modal_image_fusion_tpu.models.profile

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
