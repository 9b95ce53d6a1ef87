#!/bin/bash
# Fetch the caffe Places365 VGG-16 and convert it for this framework
# (/root/reference/download_pretrained_vgg16.sh equivalent). Requires torch +
# the caffemodel2pytorch tool for the caffe->h5 step; the final conversion
# uses our checkpoint converter.
set -e
mkdir -p pre_trained_models
git clone https://github.com/vadimkantorov/caffemodel2pytorch
wget http://places2.csail.mit.edu/models_places365/vgg16_places365.caffemodel
wget https://raw.githubusercontent.com/CSAILVision/places365/master/deploy_vgg16_places365.prototxt
python caffemodel2pytorch/caffemodel2pytorch.py vgg16_places365.caffemodel -o vgg_places365.h5
python - <<'PY'
# h5 -> torch state dict with caffe-style names (conv1_1..fc8a); the vgg-pt
# converter auto-remaps those onto torchvision indices, mirroring
# /root/reference/caffe2pytorchvgg16.py's named-Sequential load
import torch, h5py, numpy as np
sd = {}
with h5py.File('vgg_places365.h5', 'r') as f:
    for k in f.keys():
        sd[k] = torch.from_numpy(np.asarray(f[k]))
torch.save(sd, 'pre_trained_models/vgg_places_365_raw.pt')
PY
python -m semantic_pyramid_for_image_generation_tpu.cli.convert_checkpoint \
    vgg-pt pre_trained_models/vgg_places_365_raw.pt pre_trained_models/vgg_places365_orbax
rm -rf caffemodel2pytorch vgg16_places365.caffemodel deploy_vgg16_places365.prototxt vgg_places365.h5
