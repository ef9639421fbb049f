"""Decide the LW rtrn default: Pallas fused kernel vs XLA analytic path.

Times the full standalone radiation closure (bench.py's metric-2 payload)
with CLIMT_TPU_PALLAS=0 and =1, plus the LW driver alone, so the
dispatch default in lw_spectral.rtrn_lw is set by measurement rather
than by the kernel-design argument.  Run on the real chip:

    python tools/diag_rtrn_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(msg):
    print('[{:6.1f}s] {}'.format(time.time() - t0, msg), flush=True)


def main():
    import jax
    from bench import enable_compile_cache, build_radiation_bench, \
        measure_radiation_compiled
    enable_compile_cache()
    log('devices: {}'.format(jax.devices()))

    results = {}
    for mode in ('0', '1'):
        os.environ['CLIMT_TPU_PALLAS'] = mode
        # _pallas_mode reads the env at trace time; fresh jit per mode
        rad_fn, ncol = build_radiation_bench()
        compiled = rad_fn.lower().compile()
        log('compiled mode pallas={}'.format(mode))
        rate = measure_radiation_compiled(compiled, ncol)
        results[mode] = rate
        log('LW+SW pallas={}: {:8.0f} col/s  ({:.1f} ms / {} col)'.format(
            mode, rate, ncol / rate * 1e3, ncol))
    log('speedup pallas on/off: {:.2f}x'.format(
        results['1'] / results['0']))


if __name__ == '__main__':
    main()
