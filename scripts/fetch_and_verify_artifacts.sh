#!/bin/bash
# ONE command from "fresh TPU VM with internet" to the north-star artifacts
# (VERDICT r3 item 8): fetches whatever is missing, then runs the artifact
# selftest, which evaluates every unlocked number against the expected values
# written down in scripts/artifact_selftest.py (VGG 7.493/23.047 before and
# 51.140/82.085 after fine-tune +-tolerances, self-FID < 2, untrained-G
# FID-10k sanity band 300-500).
set -e
cd "$(dirname "$0")/.."

[ -f pre_trained_models/inception_v3_google.pth ] || bash scripts/download_inception.sh
[ -f pre_trained_models/vgg_places_365_raw.pt ]   || bash scripts/download_pretrained_vgg16.sh
[ -d places365_standard/val ]                      || bash scripts/download_places365.sh

# the fine-tuned VGG is produced, not downloaded (3 epochs, reference
# hyperparams); skip here if absent — the selftest prints the command
python scripts/artifact_selftest.py "$@"
