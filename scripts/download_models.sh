#!/bin/bash
# Fetch pretrained checkpoints and convert them to fastmot_tpu .npz files.
#
# Run this AT HOME (with network access); the development environment this
# repo is built in has zero egress, so no weights ship in-tree — every
# model runs with random init until the .npz files below exist. All
# conversions verify themselves with a strict full-coverage reload and
# fail loudly on any architecture/shape mismatch.
#
# Sources:
#   * The reference project's released checkpoints (Google Drive, same
#     ids its scripts/download_models.sh uses): OSNet-x0.25 (MSMT17) and
#     YOLOv4 (CrowdHuman) as ONNX, the three SSD COCO models as TF frozen
#     graphs. Consumed directly — no onnx/tensorflow needed
#     (fastmot_tpu/models/protoparse.py reads the wire format).
#   * Upstream Darknet releases for the stock YOLO zoo
#     (github.com/AlexeyAB/darknet/releases).

set -e
BASEDIR=$(dirname "$0")
DL=${1:-/tmp/fastmot_tpu_models}
mkdir -p "$DL"

pip3 install --quiet gdown

cd "$BASEDIR/.."

# --- reference-released checkpoints (exact files FastMOT ships) ----------
gdown https://drive.google.com/uc?id=1MLC2lKnQvAQgBKZP1EXB6UdmqujY9qVd -O "$DL/osnet_x0_25_msmt17.onnx"
gdown https://drive.google.com/uc?id=1-kXZpA6y8pNbDMMD7N--IWIjwqqnAIGZ -O "$DL/yolov4_crowdhuman.onnx"
gdown https://drive.google.com/uc?id=1-Cqk2P72P4feYLJGtJFPcCxN5JttzTfX -O "$DL/ssd_inception_v2_coco.pb"
gdown https://drive.google.com/uc?id=1IfSveiXaub-L6PO9mqne5pk2EByzb25z -O "$DL/ssd_mobilenet_v1_coco.pb"
gdown https://drive.google.com/uc?id=1ste0fQevAjF4UqD3JsCtu1rUAwCTmETN -O "$DL/ssd_mobilenet_v2_coco.pb"

python3 scripts/convert_weights.py osnet --ckpt "$DL/osnet_x0_25_msmt17.onnx" --model OSNet025
python3 scripts/convert_weights.py onnx  --onnx "$DL/yolov4_crowdhuman.onnx" --model YOLOv4
python3 scripts/convert_weights.py ssd   --pb "$DL/ssd_mobilenet_v1_coco.pb" --model SSDMobileNetV1
python3 scripts/convert_weights.py ssd   --pb "$DL/ssd_mobilenet_v2_coco.pb" --model SSDMobileNetV2
python3 scripts/convert_weights.py ssd   --pb "$DL/ssd_inception_v2_coco.pb" --model SSDInceptionV2

# --- stock Darknet zoo (optional) -----------------------------------------
DARKNET=https://github.com/AlexeyAB/darknet/releases/download
wget -nc -P "$DL" "$DARKNET/darknet_yolo_v3_optimal/yolov3.weights" || true
wget -nc -P "$DL" "$DARKNET/darknet_yolo_v4_pre/yolov4.weights" || true
wget -nc -P "$DL" "$DARKNET/darknet_yolo_v4_pre/yolov4-tiny.weights" || true
for w in yolov3 yolov4; do
  if [ -f "$DL/$w.weights" ]; then
    name=$(echo "$w" | sed 's/yolov3/YOLOv3/; s/yolov4/YOLOv4/')
    python3 scripts/convert_weights.py darknet --model "$name" \
        --weights "$DL/$w.weights" --out "fastmot_tpu/models/weights/$name-coco.npz"
  fi
done
if [ -f "$DL/yolov4-tiny.weights" ]; then
  python3 scripts/convert_weights.py darknet --model YOLOv4Tiny \
      --weights "$DL/yolov4-tiny.weights" \
      --out fastmot_tpu/models/weights/YOLOv4Tiny-coco.npz
fi

echo "Converted weights in fastmot_tpu/models/weights/:"
ls -la fastmot_tpu/models/weights/*.npz
