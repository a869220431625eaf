#!/bin/sh
# Build -> test -> render smoke loop, the reference's go.sh:6-17 for the
# TPU framework: run the test suite; only when green, render the vault
# demo (the reference's headline workload) through the CLI.
set -e
cd "$(dirname "$0")"

if python -m pytest tests/ -x -q; then
    echo "Tests succeeded!"
    mkdir -p impulses/vault
    time python -m rayverb_tpu.cli \
        assets/configs/vault.json \
        assets/test_models/vault.obj \
        assets/materials/vault.json \
        impulses/vault/vault_vault_vault.wav \
        --stats
else
    echo "Tests failed. Skipping running the raytracer."
    exit 1
fi
