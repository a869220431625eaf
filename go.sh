#!/bin/sh
# Build -> test -> render smoke loop, the reference's go.sh:6-17 for the
# TPU framework: run the test suite; only when green, render the vault
# demo (the reference's headline workload) through the CLI.
#
# Default runs the FAST test tier (the slow at-scale parity/oracle cases
# are marked @pytest.mark.slow and skipped — see pyproject.toml). Pass
# --all to run every test.
set -e
cd "$(dirname "$0")"

MARK="not slow"
if [ "$1" = "--all" ]; then
    MARK=""
fi

if python -m pytest tests/ -x -q -m "$MARK"; then
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
