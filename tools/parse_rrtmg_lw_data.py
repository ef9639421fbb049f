"""Extract the in-tree RRTMG-LW support data into climt_tpu/data/.

The reference's longwave gas absorption tables (rrtmg_lw_k_g.f90, the kao/
kbo/selfrefo/forrefo/fracref data) are STRIPPED from this mirror
(/root/reference/.MISSING_LARGE_BLOBS:1) and exist nowhere on this machine
(see tools/find_lw_ktables.py for the audit).  Everything else the LW
pipeline needs IS in-tree and is extracted here, byte-exact:

- MLS reference atmosphere: pref/preflog/tref (59) and chi_mls(7,59)
  (rrtmg_lw_setcoef.f90 lwatmref)
- Integrated Planck tables: totplnk(181,16), totplk16(181) and their
  temperature derivatives (rrtmg_lw_setcoef.f90 lwavplank/lwavplankderiv)
- Band limits wavenum1/2, delwave and the key-species counts nspa/nspb
  (rrtmg_lw_init.f90 lwdatinit)
- The 256->140 g-point reduction: ngc/ngs/ngm/ngn/ngb/wt and the derived
  rwgt (rrtmg_lw_init.f90 lwcmbdat)
- Cloud LW absorption tables: abscld1, absice0..3, absliq0/absliq1
  (rrtmg_lw_init.f90 lwcldpr)
- Diffusivity-angle coefficients a0/a1/a2 and wtdiff
  (rrtmg_lw_rtrn.f90:239-258)

Run:  python tools/parse_rrtmg_lw_data.py
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from parse_rrtmg_sw_data import assemble, parse_fortran_assignments  # noqa: E402

REF = '/root/reference/climt/_lib/rrtmg_lw'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'climt_tpu', 'data', 'rrtmg_lw_support.npz')


def parse_subroutine(filename, subroutine):
    text = open(os.path.join(REF, filename)).read()
    m = re.search(r'subroutine %s\b(.*?)end subroutine %s'
                  % (subroutine, subroutine), text, re.S)
    raw = parse_fortran_assignments(m.group(1).splitlines())
    return {k: assemble(v) for k, v in raw.items()}


_NUM = re.compile(r'[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?(?=_rb)')
_ANYNUM = re.compile(r'[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?')
_RSTMT = re.compile(r'^\s*(\w+)\s*\(([^=]*)\)\s*=\s*(.*)$')


def parse_ranged_assignments(filename, subroutine, names, integer=False):
    """Parse `name(i, lo:hi) = (/ vals /)` statements where one index is a
    range slice (the lwatmref/lwavplank style).  Returns dense arrays with
    1-based Fortran indices mapped to 0-based numpy indices."""
    text = open(os.path.join(REF, filename)).read()
    m = re.search(r'subroutine %s\b(.*?)end subroutine %s'
                  % (subroutine, subroutine), text, re.S)
    lines = m.group(1).splitlines()
    pieces = {n: [] for n in names}
    i = 0
    while i < len(lines):
        line = lines[i].split('!')[0].rstrip()
        i += 1
        sm = _RSTMT.match(line)
        if not sm or sm.group(1) not in names:
            continue
        name, idx, stmt = sm.group(1), sm.group(2), sm.group(3)
        while stmt.rstrip().endswith('&'):
            nxt = lines[i].split('!')[0]
            i += 1
            if not nxt.strip():
                continue
            stmt = stmt.rstrip()[:-1] + nxt.strip().lstrip('&')
        body = stmt[stmt.index('(/') + 2:stmt.rindex('/)')]
        num_re = _ANYNUM if integer else _NUM
        vals = [float(v.replace('_rb', '').replace('d', 'e').replace(
                    'D', 'E'))
                for v in num_re.findall(body)]
        parts = [p.strip() for p in idx.split(',')]
        index = []
        for p in parts:
            if ':' in p:
                lo, hi = p.split(':')
                index.append((int(lo) if lo else 1,
                              int(hi) if hi else None))
            else:
                index.append(int(p))
        pieces[name].append((index, vals))
    out = {}
    for name, entries in pieces.items():
        assert entries, name
        rank = len(entries[0][0])
        shape = [0] * rank
        for index, vals in entries:
            for j, p in enumerate(index):
                if isinstance(p, tuple):
                    hi = p[1] if p[1] is not None else p[0] + len(vals) - 1
                    shape[j] = max(shape[j], hi)
                else:
                    shape[j] = max(shape[j], p)
        arr = np.full(shape, np.nan)
        for index, vals in entries:
            sel = []
            for p in index:
                if isinstance(p, tuple):
                    hi = p[1] if p[1] is not None else p[0] + len(vals) - 1
                    sel.append(slice(p[0] - 1, hi))
                else:
                    sel.append(p - 1)
            arr[tuple(sel)] = vals
        assert not np.isnan(arr).any(), 'holes in %s' % name
        out[name] = arr
    return out


_DATA = re.compile(r'data\s+(\w+)\s*/(.*?)/', re.S)


def parse_data_statements(filename):
    """Parse Fortran `data name / v1, v2, ... /` statements (rtrn.f90)."""
    text = open(os.path.join(REF, filename)).read()
    # strip comment lines and continuation ampersands so values flow
    lines = [l.split('!')[0] for l in text.splitlines()]
    joined = '\n'.join(lines).replace('&', ' ')
    out = {}
    for name, body in _DATA.findall(joined):
        vals = [float(v.strip().replace('_rb', '').replace('d', 'e'))
                for v in body.split(',') if v.strip()]
        out[name] = np.array(vals)
    return out


def main():
    out = {}

    # --- reference atmosphere + Planck tables (setcoef) ---
    ref = parse_subroutine('rrtmg_lw_setcoef.f90', 'lwatmref')
    for k in ('pref', 'preflog', 'tref'):
        out[k] = ref[k]
        assert out[k].shape == (59,)
    out['chi_mls'] = parse_ranged_assignments(
        'rrtmg_lw_setcoef.f90', 'lwatmref', ['chi_mls'])['chi_mls']
    assert out['chi_mls'].shape == (7, 59), out['chi_mls'].shape

    plnk = parse_ranged_assignments(
        'rrtmg_lw_setcoef.f90', 'lwavplank', ['totplnk', 'totplk16'])
    out['totplnk'] = plnk['totplnk']
    assert out['totplnk'].shape == (181, 16)
    out['totplk16'] = plnk['totplk16']
    assert out['totplk16'].shape == (181,)

    dplnk = parse_ranged_assignments(
        'rrtmg_lw_setcoef.f90', 'lwavplankderiv',
        ['totplnkderiv', 'totplk16deriv'])
    out['totplnkderiv'] = dplnk['totplnkderiv']
    out['totplk16deriv'] = dplnk['totplk16deriv']
    assert out['totplnkderiv'].shape == (181, 16)

    # --- band limits + key-species counts (lwdatinit) ---
    dat = parse_ranged_assignments(
        'rrtmg_lw_init.f90', 'lwdatinit',
        ['wavenum1', 'wavenum2', 'delwave', 'nspa', 'nspb'], integer=True)
    for k in ('wavenum1', 'wavenum2', 'delwave', 'nspa', 'nspb'):
        out[k] = dat[k]
        assert out[k].shape == (16,), (k, out[k].shape)

    # --- g-point reduction (lwcmbdat) ---
    cmb = parse_ranged_assignments(
        'rrtmg_lw_init.f90', 'lwcmbdat',
        ['ngc', 'ngs', 'ngm', 'ngn', 'ngb', 'wt'], integer=True)
    for k in ('ngc', 'ngs', 'ngm', 'ngn', 'ngb', 'wt'):
        out[k] = cmb[k]
    assert out['ngm'].shape == (256,) and out['ngn'].shape == (140,)
    assert out['ngb'].shape == (140,) and out['wt'].shape == (16,)
    # rwgt: weight of each original g-point within its combined g-point
    # (rrtmg_lw_init.f90:100-118 rrtmg_lw_ini)
    wt, ngn = out['wt'], out['ngn'].astype(int)
    rwgt = np.empty(256)
    igcsm = 0
    iprsm = 0
    for ibnd in range(16):
        for _ in range(int(out['ngc'][ibnd])):
            ngs_ = ngn[igcsm]
            wtsum = wt[iprsm % 16:iprsm % 16 + ngs_].sum()
            rwgt[iprsm:iprsm + ngs_] = (
                wt[iprsm % 16:iprsm % 16 + ngs_] / wtsum)
            iprsm += ngs_
            igcsm += 1
        assert iprsm % 16 == 0
    out['rwgt'] = rwgt

    # --- cloud LW absorption tables (lwcldpr) ---
    cld = parse_subroutine('rrtmg_lw_init.f90', 'lwcldpr')
    out['abscld1'] = cld['abscld1']
    out['absice0'] = cld['absice0']
    out['absice1'] = cld['absice1']          # (2, 5)
    out['absice2'] = cld['absice2']          # (43, 16)
    out['absice3'] = cld['absice3']          # (46, 16)
    out['absliq0'] = cld['absliq0']
    out['absliq1'] = cld['absliq1']          # (58, 16)
    assert out['absice2'].shape == (43, 16)
    assert out['absice3'].shape == (46, 16)
    assert out['absliq1'].shape == (58, 16)

    # --- diffusivity-angle adjustment (rtrn.f90:239-258) ---
    rtrn = parse_data_statements('rrtmg_lw_rtrn.f90')
    for k in ('a0', 'a1', 'a2'):
        out['secdiff_' + k] = rtrn[k]
        assert rtrn[k].shape == (16,)
    out['wtdiff'] = rtrn['wtdiff']
    out['rec_6'] = rtrn['rec_6']

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **{k: np.asarray(v, dtype=np.float64)
                                for k, v in out.items()})
    print('wrote %s (%.2f MB, %d arrays)'
          % (OUT, os.path.getsize(OUT) / 1e6, len(out)))
    for k, v in sorted(out.items()):
        print(' ', k, np.shape(v))


if __name__ == '__main__':
    main()
