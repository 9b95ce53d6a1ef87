#!/bin/bash
# Places365 "easyformat" download (/root/reference/download_places365.sh).
set -e
wget http://data.csail.mit.edu/places/places365/places365standard_easyformat.tar
tar -xf places365standard_easyformat.tar
