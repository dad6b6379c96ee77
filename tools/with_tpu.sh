#!/bin/bash
# Serialize TPU-tunnel clients: the axon tunnel is single-client and WEDGES
# GLOBALLY (all new processes hang at the first device op) if two JAX
# processes attach concurrently. Every TPU invocation in this repo should
# go through this wrapper:
#
#   tools/with_tpu.sh python bench.py
#
# Takes an exclusive flock, probes the tunnel with a trivial matmul first
# (fail fast instead of hanging the real run), then execs the command.
set -u
LOCK=/tmp/bioem_tpu.lock
exec 9>"$LOCK"
if ! flock -w 1200 9; then
    echo "with_tpu: another TPU client holds $LOCK (waited 20 min)" >&2
    exit 75
fi
if ! timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
np.asarray(x @ x)
" >/dev/null 2>&1; then
    echo "with_tpu: tunnel probe failed/hung — tunnel is wedged, not running: $*" >&2
    exit 74
fi
"$@"
