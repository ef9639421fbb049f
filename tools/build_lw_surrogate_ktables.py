"""Materialize the surrogate RRTMG-LW k-distribution npz.

Builds climt_tpu/data/rrtmg_lw_kdist_surrogate.npz from the calibrated
parameter vector (climt_tpu/data/rrtmg_lw_surrogate_params.json, written
by tools/calibrate_lw_ktables.py; physical priors if absent).  See
climt_tpu/components/rrtmg/lw_surrogate.py for the construction and
docs/RRTMG_LW_STATUS.md for why surrogate tables are needed at all.

Run:  python tools/build_lw_surrogate_ktables.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import cpu_env  # noqa: F401  (must be first: forces JAX onto host CPU)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from climt_tpu.components.rrtmg import lw_surrogate  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), '..',
                   'climt_tpu', 'data', 'rrtmg_lw_kdist_surrogate.npz')


def main():
    theta = lw_surrogate.load_calibrated_params()
    tables = lw_surrogate.build_tables(theta)
    np.savez_compressed(OUT, **{k: np.asarray(v, np.float64)
                                for k, v in tables.items()})
    print('wrote %s (%.2f MB, %d arrays)'
          % (OUT, os.path.getsize(OUT) / 1e6, len(tables)))


if __name__ == '__main__':
    main()
