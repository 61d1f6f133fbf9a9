# Test on an 8-device virtual CPU mesh (PYTHONPATH= bypasses the axon
# sitecustomize that pins the platform to the TPU plugin).
test:
	PYTHONPATH= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -m pytest tests/ -q

test-tpu:
	python -m pytest tests/ -q

bench:
	python bench.py

.PHONY: test test-tpu bench
