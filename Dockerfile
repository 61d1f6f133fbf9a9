# fastmot_tpu container — the reference's Dockerfile analog
# (reference Dockerfile:1-113 builds TensorRT + GStreamer-OpenCV on an
# nvcr TensorRT base; the TPU-native equivalent is far smaller: JAX+libtpu
# come as wheels, and the only native build is the framepipe ring buffer).
#
# Build:    docker build -t fastmot-tpu .
# Run (TPU VM; exposes the accelerator via /dev and the libtpu runtime):
#   docker run --rm --privileged --net=host \
#       -v /path/to/videos:/videos fastmot-tpu \
#       python3 app.py --input-uri /videos/seq.mp4 --mot --txt /videos/out.txt
#
# On a TPU VM the host libtpu is found automatically by the jax[tpu]
# wheel; no driver installation inside the image is needed (unlike the
# reference's CUDA/TensorRT stack).
FROM python:3.12-slim-bookworm

ENV PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1 \
    # persistent XLA compile cache (the TensorRT engine-cache analog,
    # utils/inference.py:56-63): mount a volume here to skip recompiles
    FASTMOT_TPU_CACHE_DIR=/cache/xla

# g++ builds native/framepipe.cpp; libgl/libglib are OpenCV runtime deps
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg62-turbo-dev libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /usr/src/app

COPY requirements.txt .
# jax[tpu] pulls libtpu from the Google releases index on TPU hosts;
# harmless (falls back to CPU jaxlib) elsewhere.
RUN pip install -r requirements.txt && \
    pip install 'jax[tpu]' \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
      || true

COPY . .
RUN make -C native && mkdir -p /cache/xla

# bake the models (reference download_models.sh role) at build time when
# network is available; at runtime weights can also be mounted under
# fastmot_tpu/models/weights/
RUN ./scripts/download_models.sh || \
    echo 'model download skipped (no network at build time)'

ENTRYPOINT []
CMD ["python3", "app.py", "--help"]
