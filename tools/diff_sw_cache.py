"""Diff climt_tpu RRTMG components against the reference regression caches.

Usage: python tools/diff_sw_cache.py [TestName] [descriptor]
Defaults to TestRRTMGShortwave column.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import climt_tpu as ct
from golden import load_cached_outputs

test_name = sys.argv[1] if len(sys.argv) > 1 else 'TestRRTMGShortwave'
descriptor = sys.argv[2] if len(sys.argv) > 2 else 'column'

component_factories = {
    'TestRRTMGShortwave': lambda: ct.RRTMGShortwave(),
    'TestRRTMGShortwaveMCICA': lambda: ct.RRTMGShortwave(mcica=True),
    'TestRRTMGLongwave': lambda: ct.RRTMGLongwave(),
    'TestRRTMGLongwaveMCICA': lambda: ct.RRTMGLongwave(mcica=True),
    'TestRRTMGLongwaveWithClouds': lambda: ct.RRTMGLongwave(
        cloud_optical_properties='single_cloud_type'),
    'TestRRTMGLongwaveWithExternalInterfaceTemperature':
        lambda: ct.RRTMGLongwave(calculate_interface_temperature=False),
}

comp = component_factories[test_name]()
if descriptor == 'column':
    grid = ct.get_grid(nx=None, ny=None, nz=30)
else:
    grid = ct.get_grid(nx=32, ny=16, nz=28)
state = ct.get_default_state([comp], grid_state=grid)
print('time:', state['time'])
tend, diag = comp(state)
cached = load_cached_outputs(test_name, descriptor)
for i, (cur, name) in enumerate([(tend, 'tend'), (diag, 'diag')][:len(cached)]):
    cac = cached[i]
    for k, (cv, cu, cd) in cac.items():
        if k == 'time':
            continue
        if k not in cur:
            print(f'{name}: MISSING {k}')
            continue
        v = cur[k]
        if cu and v.units != cu:
            v = v.to_units(cu)
        a = np.asarray(v.values).squeeze()
        b = np.asarray(cv).squeeze()
        if a.shape != b.shape:
            print(f'{name}/{k}: shape {a.shape} vs {b.shape}')
            continue
        err = np.max(np.abs(a - b))
        rel = err / (np.max(np.abs(b)) + 1e-300)
        print(f'{name}/{k}: maxabs={err:.3e} rel={rel:.3e}  '
              f'ref_range=[{b.min():.4g},{b.max():.4g}]')
