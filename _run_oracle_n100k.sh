#!/bin/bash
# Build the complete N=100k f64 oracle store (.oracle_n100000.npz),
# resumable in 12-leaf chunks. Runs until all 144 leaves are done.
cd /root/repo
# --platform cpu: the sitecustomize pins jax_platforms='axon,cpu', which
# overrides the JAX_PLATFORMS env var — the flag calls jax.config.update
# before first backend use, keeping the oracle build off the TPU tunnel.
for start in $(seq 0 12 143); do
  python bench.py --platform cpu --oracle-chunk "$start" 12 \
    >> /tmp/oracle_n100k.log 2>&1
done
echo "ORACLE BUILD DONE" >> /tmp/oracle_n100k.log
