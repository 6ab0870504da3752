"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver separately validates the
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

# KEEP_PLATFORM=1 runs the suite on the default JAX platform instead — the
# on-chip smoke for the checkpoint-loading / quantization paths
# (`KEEP_PLATFORM=1 pytest tests/test_checkpoint_load.py tests/test_quant.py`
# drives convert->extract on the real TPU; see CLAUDE.md).
_keep_platform = bool(os.environ.get('KEEP_PLATFORM'))
if not _keep_platform:
    os.environ['JAX_PLATFORMS'] = 'cpu'   # hard override: env pins axon (TPU)
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('HF_HUB_OFFLINE', '1')

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

if not _keep_platform:
    jax.config.update('jax_platforms', 'cpu')

# This environment defaults fp32 matmuls to bf16 passes (TPU MXU semantics,
# also emulated on the CPU backend).  Parity tests against torch need true
# fp32 accumulation.
jax.config.update('jax_default_matmul_precision', 'float32')


@pytest.fixture(scope='session')
def devices():
    return jax.devices()
