#!/bin/bash
# CLI end-to-end exercise, mirroring the reference's test_cli.sh (all 10
# subcommands incl. the EVM path). Expects the reference data mounted at
# /root/reference and a working JAX backend (TPU or CPU; CPU is slow on the
# first run while kernels compile).
set -e

ZERO_G="python -m zerog_tpu.cli"
MODELS=${MODELS:-/root/reference/models}
IMG=${IMG:-/root/reference/benches/example_image_7.png}
MNIST_PNG=${MNIST_PNG:-data/MNIST/png}

$ZERO_G --help

mkdir -p test_data

echo ""
echo "==== Running predict"
$ZERO_G predict "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" "$IMG"

if [ -d "$MNIST_PNG" ]; then
    echo ""
    echo "==== Running compute-accuracy"
    $ZERO_G compute-accuracy "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" "$MNIST_PNG"
fi

echo ""
echo "==== Running mock-proof"
$ZERO_G mock-proof "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" "$IMG" -k 14

echo ""
echo "==== Running generate-srs"
$ZERO_G generate-srs -k 14 --srs-path test_data/srs_14

echo ""
echo "==== Running generate-keys"
$ZERO_G generate-keys "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" \
    --srs-path test_data/srs_14 \
    --vk-path test_data/vk.npz \
    --pk-path test_data/pk.npz \
    --circuit-params-path test_data/circuit_params.json

echo ""
echo "==== Running dry-run-evm-verifier"
$ZERO_G dry-run-evm-verifier "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" "$IMG" \
    --srs-path test_data/srs_14 \
    --pk-path test_data/pk.npz \
    --circuit-params-path test_data/circuit_params.json

echo ""
echo "==== Running deploy-evm-verifier"
$ZERO_G deploy-evm-verifier \
    --srs-path test_data/srs_14 \
    --vk-path test_data/vk.npz \
    --circuit-params-path test_data/circuit_params.json

echo ""
echo "==== Running proof"
$ZERO_G proof "$MODELS/model_28input_256entry_1hash_1bpi.hdf5" "$IMG" \
    --srs-path test_data/srs_14 \
    --pk-path test_data/pk.npz \
    --circuit-params-path test_data/circuit_params.json \
    --proof-path test_data/proof.json

echo ""
echo "==== Running verify"
$ZERO_G verify \
    --srs-path test_data/srs_14 \
    --vk-path test_data/vk.npz \
    --circuit-params-path test_data/circuit_params.json \
    --proof-path test_data/proof.json

echo ""
echo "==== Running submit-proof"
# With the in-process dev node, account 0's first deploy always lands at the
# same address (same convention as the reference's Anvil note).
$ZERO_G submit-proof \
    --proof-path test_data/proof.json \
    0x5fbdb2315678afecb367f032d93f642f64180aa3
