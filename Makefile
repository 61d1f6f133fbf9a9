# Test on an 8-device virtual CPU mesh (PYTHONPATH= bypasses the axon
# sitecustomize that pins the platform to the TPU plugin).
CPU_MESH = PYTHONPATH= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8

test:
	$(CPU_MESH) python -m pytest tests/ -q

# Smoke tier: kernel oracles, one parity seed, chain smoke, one
# end-to-end run — the subprocess CLI matrix, multi-seed fuzzing and the
# heaviest compile variants (calibrated-OSNet int8, SSDMobileNetV2/P6
# roundtrips, flagship dryrun) are marked `slow` and stay in `make test`.
# Measured 14-24 min with a COLD XLA cache (compile-dominated; the high
# end is a loaded/slower host), ~4-16 min warm (fastmot_tpu persists
# compiles to ~/.cache/fastmot_tpu_xla keyed by host CPU, so only the
# first run of a checkout on a given host class is cold).
test-fast:
	$(CPU_MESH) python -m pytest tests/ -q -m "not slow"

test-tpu:
	python -m pytest tests/ -q

bench:
	python bench.py

# All five BASELINE configs, one JSON line each (see docs/PERFORMANCE.md):
# 1 SSD+OSNet, 2 YOLOv4 40-obj, 3 MOT20 density 80-obj, 4 Scaled aerial,
# 5 eight-stream aggregate. Runs on the real chip.
bench-all:
	python bench.py --config 1
	python bench.py --config 2
	python bench.py --config 3
	python bench.py --config 4
	python bench.py --config 5

# At-home real-weights parity check (needs network; zero-egress sandboxes
# cannot run this): download pretrained weights + MOT20, convert, run the
# tracker over MOT20-01, score with built-in eval AND cross-check IDF1/MOTA
# against the official TrackEval, asserting the <=0.5 bound from BASELINE.md.
# INT8=1 additionally runs a YOLOv4 f32-vs-int8 A/B (entropy-calibrated on
# the sequence's images) asserting int8 costs <=0.5 MOTA/IDF1 vs f32.
parity:
	bash scripts/parity_check.sh

parity-int8:
	INT8=1 bash scripts/parity_check.sh

.PHONY: test test-fast test-tpu bench bench-all parity
