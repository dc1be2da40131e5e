#!/bin/bash
# Sequential quality-parity suite (one TPU job at a time — remote compiles
# serialize). Each run writes docs/results/<name>.json + a training JSONL.
set -x
cd /root/repo
mkdir -p docs/results /tmp/qlogs
run() {
  name=$1; shift
  timeout 7200 python benchmarks/quality_parity.py "$@" \
    --out docs/results/${name}.json --jsonl /tmp/qlogs/${name}.jsonl \
    > /tmp/qlogs/${name}.log 2>&1
  echo "=== ${name} exit $? ==="
}
run modelnet_nolbo          --config modelnet_nolbo --steps 20000
run modelnet_nolbo_classic  --config modelnet_nolbo --steps 20000 --classic
run modelnet_vae            --config modelnet_vae   --steps 20000
run modelnet_ae             --config modelnet_ae    --steps 20000
echo "SUITE DONE"
