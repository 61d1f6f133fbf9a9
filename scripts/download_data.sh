#!/bin/bash
# Fetch the evaluation / calibration datasets (run AT HOME — the build
# environment has zero egress). Capability reference: the reference's
# scripts/download_data.sh (MOT20 for eval, VOC2007 for INT8
# calibration).

set -e
DIR=${1:-$HOME/datasets}
mkdir -p "$DIR"

# MOT20 train (eval methodology: README "Weights" section + eval docs;
# PUBLIC detector replays MOT20/train/*/det/det.txt)
wget -nc -P "$DIR" https://motchallenge.net/data/MOT20.zip
unzip -n "$DIR/MOT20.zip" -d "$DIR"

# VOC2007 (INT8 entropy-calibration image pool, models/quantize.py
# EntropyCalibrator — any diverse natural-image set works)
wget -nc -P "$DIR" \
  http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar
tar -xf "$DIR/VOCtrainval_06-Nov-2007.tar" -C "$DIR" --skip-old-files

echo "datasets in $DIR; MOT20 repro:"
echo "  python app.py -i '$DIR/MOT20/train/MOT20-01/img1/%06d.jpg' \\"
echo "      --mot --txt MOT20-01.txt   # cfg: detector_type=PUBLIC"
echo "  python -m fastmot_tpu.eval --gt $DIR/MOT20/train/MOT20-01/gt/gt.txt --res MOT20-01.txt"
