# TPU serving/training image (reference ships docker/Dockerfile* GPU images;
# this is the TPU-VM analogue: libtpu comes from the jax[tpu] extra).
FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    JAX_PLATFORMS="" \
    XLA_FLAGS=""

WORKDIR /app

# build toolchain for the native kernels (native/*.cc, C extension path)
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml README.md ./
COPY yolov10_3d_tpu ./yolov10_3d_tpu
COPY docs ./docs

# On a TPU VM use the libtpu wheel; elsewhere falls back to CPU jax.
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir -e . && pip install --no-cache-dir pillow

# compile the native rotated-IoU kernel used by the KITTI evaluator
RUN g++ -O3 -shared -fPIC -o yolov10_3d_tpu/native/kitti_iou.so yolov10_3d_tpu/native/kitti_iou.cc || true

ENTRYPOINT ["yolo10"]
CMD ["--help"]
