"""Import-first helper: force JAX onto host CPU with float64 enabled.

Usage (must be the FIRST import in an analysis script):

    import sys; sys.path.insert(0, 'tools'); import cpu_env  # noqa

Mirrors tests/conftest.py: drops non-CPU PJRT backends (e.g. the tunneled
TPU plugin a site hook registers) so ad-hoc analysis runs never claim the
scarce TPU session or pay its compile latency, and enables x64 so golden
comparisons against the reference's double-precision caches are meaningful.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') +
    ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

for _name in [n for n in list(_xb._backend_factories) if n != 'cpu']:
    _xb._backend_factories.pop(_name, None)

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
