"""Test env: CPU backend with 8 virtual devices (the TPU-native analogue of
the reference's mocked multi-GPU tests — SURVEY §4)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the shell may point at a TPU
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# a pytest plugin may have imported jax before this conftest ran; the env
# vars above are then too late — force the platform through jax.config
# (valid until the first backend is initialized)
import jax
jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', (
    'tests must run on the CPU backend; a plugin initialized '
    f'{jax.default_backend()} before conftest could force cpu')

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
