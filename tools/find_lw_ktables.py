"""Audit: the RRTMG-LW gas-absorption k-tables are unobtainable here.

The reference mirror strips ``climt/_lib/rrtmg_lw/rrtmg_lw_k_g.f90`` (the
~2.5 MB kao/kbo/selfrefo/forrefo/fracref absorption data, listed first in
/root/reference/.MISSING_LARGE_BLOBS).  This script documents that the data
exists nowhere else on this machine and cannot be regenerated:

1. no ``rrtmg_lw_k_g.f90`` / ``rrtmg_lw.nc`` anywhere on the filesystem,
2. no installed Python package ships RRTMG-LW data (climlab/climlab-rrtmg
   are not installed),
3. no Fortran compiler exists (gfortran/flang absent), so even the in-tree
   LW driver cannot be built against substitute data,
4. network egress is disabled, so AER's public release is unreachable.

Everything ELSE the LW pipeline needs is in-tree and extracted by
tools/parse_rrtmg_lw_data.py.  See docs/RRTMG_LW_STATUS.md for the
consequences (surrogate k-tables + measured tolerances).

Run:  python tools/find_lw_ktables.py
"""

import os
import shutil
import subprocess
import sys


def main():
    ok = True

    listed = open('/root/reference/.MISSING_LARGE_BLOBS').read().splitlines()
    print('[1] stripped blobs listed by the mirror:')
    for line in listed:
        print('     ', line)
    assert 'climt/_lib/rrtmg_lw/rrtmg_lw_k_g.f90' in listed

    print('[2] filesystem search for LW k-table data '
          '(rrtmg_lw_k_g.f90 / rrtmg_lw*.nc):')
    hits = subprocess.run(
        ['find', '/', '-name', 'rrtmg_lw_k_g*', '-o', '-name',
         'rrtmg_lw*.nc'],
        capture_output=True, text=True, timeout=600)
    found = [h for h in hits.stdout.splitlines() if h.strip()]
    print('      hits: %r' % found)
    if found:
        ok = False

    print('[3] Fortran compilers available:')
    compilers = {c: shutil.which(c)
                 for c in ('gfortran', 'flang', 'flang-new', 'f77', 'g77',
                           'ifort', 'ifx')}
    print('      %r' % compilers)
    if any(compilers.values()):
        ok = False

    print('[4] installed packages that could ship RRTMG data:')
    try:
        import climlab  # noqa: F401
        print('      climlab IS installed')
        ok = False
    except ImportError:
        print('      climlab: not installed')
    try:
        import climlab_rrtmg  # noqa: F401
        print('      climlab_rrtmg IS installed')
        ok = False
    except ImportError:
        print('      climlab_rrtmg: not installed')

    print()
    if ok:
        print('CONFIRMED: RRTMG-LW k-table data is unobtainable in this '
              'environment.')
    else:
        print('A possible k-table source was found above -- use it!')
        sys.exit(1)


if __name__ == '__main__':
    main()
