#!/bin/bash
# Build and upload the nphm-tpu package (equivalent of the reference's
# bin/release.sh). Pass -t/--test to upload to TestPyPI.
set -euo pipefail

while [[ "$#" -gt 0 ]]; do
    case $1 in
        -t|--test) test=1 ;;
        *) echo "Unknown parameter: $1"; exit 1 ;;
    esac
    shift
done

twine_params=""
if [[ ${test:-} ]]; then
    twine_params="--repository testpypi"
fi

rm -rf dist build
python -m build
python -m twine upload $twine_params dist/*
