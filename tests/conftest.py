import os

# Validation runs on CPU in float64 so golden comparisons against the
# reference's Fortran double-precision outputs are meaningful; production
# code paths run f32/bf16 on TPU.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') +
    ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Register the Pallas TPU MLIR lowerings BEFORE dropping backend factories:
# the import needs the 'tpu' platform name to still be registered, and the
# suite exercises the radiation Pallas kernels in interpreter mode.
from jax.experimental.pallas import tpu as _pltpu  # noqa: E402,F401

import jax._src.xla_bridge as _xb  # noqa: E402

# Drop any non-CPU PJRT backends (e.g. a tunneled TPU plugin registered by a
# site hook): tests must never claim scarce accelerator sessions.
for _name in [n for n in _xb._backend_factories if n != 'cpu']:
    _xb._backend_factories.pop(_name, None)

# sitecustomize may have imported jax before this file ran, freezing
# jax_platforms at the env value; force it back to cpu.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the RRTMG/dycore programs dominate suite
# wall time on first compile; repeat runs skip straight to execution.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

import pytest  # noqa: E402

from climt_tpu.core.constants import reset_constants, set_constant  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_constants():
    reset_constants()
    set_constant('top_of_model_pressure', 20., 'Pa')
    yield
    reset_constants()
    set_constant('top_of_model_pressure', 20., 'Pa')
