#!/bin/bash
# Fetch the torchvision inception_v3 ImageNet weights the reference's FID
# rides implicitly (/root/reference/frechet_inception_distance.py:22
# `pretrained=True`), pin them by hash, and convert for this framework.
#
# torchvision names weight files `<name>-<sha256[:8]>.pth` and verifies that
# 8-hex prefix on load (torch.hub.load_state_dict_from_url); we check the
# same prefix here. After this script:
#   python -m semantic_pyramid_for_image_generation_tpu.cli.main --test \
#       --load_inception pre_trained_models/inception_v3_google.pth ...
# (the CLI converts the state dict in-process), or use the pre-converted
# orbax dir it writes.
set -e
URL="https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth"
SHA256_PREFIX="0cc3c7bd"
mkdir -p pre_trained_models
DST="pre_trained_models/inception_v3_google.pth"
wget -O "${DST}" "${URL}"
GOT=$(sha256sum "${DST}" | cut -c1-8)
if [ "${GOT}" != "${SHA256_PREFIX}" ]; then
    echo "SHA256 mismatch for ${DST}: got ${GOT}, want ${SHA256_PREFIX}" >&2
    rm -f "${DST}"
    exit 1
fi
python -m semantic_pyramid_for_image_generation_tpu.cli.convert_checkpoint \
    inception-pt "${DST}" pre_trained_models/inception_v3_orbax
echo "OK: ${DST} (sha256 ${GOT}...) + pre_trained_models/inception_v3_orbax"
