"""Extract the RRTMG-SW k-distribution data into climt_tpu/data/.

The reference ships AER's shortwave absorption-coefficient data as Fortran
DATA statements (/root/reference/climt/_lib/rrtmg_sw/rrtmg_sw_k_g.f90,
64,520 lines; BSD-licensed physical data, original 224 g-points).  This
tool mechanically parses those numeric tables, applies the operational
224->112 g-point reduction (the cmbgb weighting scheme of
rrtmg_sw_init.f90:126-155,509-..., with the mapping tables at
rrtmg_sw_init.f90:286-331 and quadrature weights at :380-386), flattens
ka/kb to the absa/absb layouts used by taumol's index arithmetic
(rrsw_kg16.f90:66-69 equivalence), and writes a single npz consumed by
climt_tpu.components.rrtmg.sw_spectral.

Also extracted: cloud-optics tables (rrsw_cld.f90), ECMWF aerosol band
properties (rrtmg_sw_init.f90 swaerpr), the NRLSSI2 mean-solar-cycle
facular/sunspot index tables (rrtmg_sw_rad.nomcica.f90), and the MLS
reference-atmosphere pressure/temperature profiles (rrtmg_sw_setcoef.f90
swatmref).

Run:  python tools/parse_rrtmg_sw_data.py
"""

import os
import re

import numpy as np

REF = '/root/reference/climt/_lib/rrtmg_sw'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'climt_tpu', 'data', 'rrtmg_sw_kdist.npz')

# g-point reduction tables (rrtmg_sw_init.f90:286-331)
NGC = [6, 12, 8, 8, 10, 10, 2, 10, 8, 6, 6, 8, 6, 12]
NGN = {
    16: [2, 2, 2, 2, 4, 4],
    17: [1, 1, 1, 1, 1, 2, 1, 2, 1, 2, 1, 2],
    18: [1, 1, 1, 1, 2, 2, 4, 4],
    19: [1, 1, 1, 1, 2, 2, 4, 4],
    20: [1, 1, 1, 1, 1, 1, 1, 1, 2, 6],
    21: [1, 1, 1, 1, 1, 1, 1, 1, 2, 6],
    22: [8, 8],
    23: [2, 2, 1, 1, 1, 1, 1, 1, 2, 4],
    24: [2, 2, 2, 2, 2, 2, 2, 2],
    25: [1, 1, 2, 2, 4, 6],
    26: [1, 1, 2, 2, 4, 6],
    27: [1, 1, 1, 1, 1, 1, 4, 6],
    28: [1, 1, 2, 2, 4, 6],
    29: [1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1, 1],
}
# RRTM 16-point quadrature weights (rrtmg_sw_init.f90:380-386)
WT = np.array([
    0.1527534276, 0.1491729617, 0.1420961469, 0.1316886544,
    0.1181945205, 0.1019300893, 0.0832767040, 0.0626720116,
    0.0424925000, 0.0046269894, 0.0038279891, 0.0030260086,
    0.0022199750, 0.0014140010, 0.0005330000, 0.0000750000])

# arrays whose FIRST parsed dim is the g index (solar-source & per-g data)
G_FIRST = {'sfluxrefo', 'irradnceo', 'facbrghto', 'snsptdrko', 'raylo',
           'raylao', 'raylbo', 'abso3ao', 'abso3bo', 'absch4o',
           'absco2o', 'absh2oo'}
# arrays reduced with the rwgt weighting (k-like); the rest (solar
# sources) are reduced by plain summation (cmbgb16s, init.f90:575-592)
K_LIKE = {'kao', 'kbo', 'selfrefo', 'forrefo', 'raylo', 'raylao',
          'raylbo', 'abso3ao', 'abso3bo', 'absch4o', 'absco2o',
          'absh2oo'}

_NUM = re.compile(
    r'[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?(?=_rb)')
_STMT = re.compile(r'^\s*(\w+)\s*(\([^=]*\))?\s*=\s*(.*)$')


def _parse_values(text):
    return [float(m.replace('d', 'e').replace('D', 'E'))
            for m in _NUM.findall(text)]


def parse_fortran_assignments(lines):
    """Parse `name(idx,...) = (/ vals /)` and `name = scalar_rb` statements.

    Returns {name: {index_tuple_or_None: [values]}}.
    """
    out = {}
    i = 0
    while i < len(lines):
        line = lines[i].split('!')[0].rstrip()
        i += 1
        if not line.strip() or '=' not in line:
            continue
        m = _STMT.match(line)
        if not m:
            continue
        name, idx, rhs = m.group(1), m.group(2), m.group(3)
        if name in ('hvrkg', 'hnamkg', 'irradscl'):
            continue
        # gather continuation lines
        stmt = rhs
        while stmt.rstrip().endswith('&'):
            if i >= len(lines):
                stmt = ''  # truncated window: drop incomplete statement
                break
            nxt = lines[i].split('!')[0]
            i += 1
            if not nxt.strip():
                continue  # comment-only line inside a continuation
            stmt = stmt.rstrip()[:-1] + nxt.strip().lstrip('&')
        if '(/' in stmt:
            body = stmt[stmt.index('(/') + 2:stmt.rindex('/)')]
            vals = _parse_values(body)
            assert vals, (name, idx, stmt[:80])
        else:
            vals = _parse_values(stmt)
            if not vals:
                continue
            assert len(vals) == 1, (name, stmt[:80])
        key = None
        if idx is not None:
            parts = [p.strip() for p in idx.strip()[1:-1].split(',')]
            if parts.count(':') != 1 or not all(
                    p == ':' or p.lstrip('-').isdigit() for p in parts):
                continue  # not a plain table statement (e.g. wkl(:,:)=0)
            cpos = parts.index(':')
            key = (cpos,) + tuple(
                int(p) for j, p in enumerate(parts) if j != cpos)
        out.setdefault(name, {})[key] = vals
    return out


def assemble(entries):
    """Assemble {(colon_pos, idx...): vector} into a dense ndarray.

    The vector dim is placed at colon_pos; remaining dims keep their
    source order (with starting offsets normalized away, e.g. jp=13:59).
    """
    if None in entries and len(entries) == 1:
        v = entries[None]
        return np.array(v[0] if len(v) == 1 else v)
    keys = list(entries)
    cpos = keys[0][0]
    assert all(k[0] == cpos for k in keys), 'mixed colon positions'
    keys = [k[1:] for k in keys]
    rank = len(keys[0])
    d1 = len(next(iter(entries.values())))
    if rank == 0:
        return np.array(entries[(cpos,)])
    mins = [min(k[j] for k in keys) for j in range(rank)]
    maxs = [max(k[j] for k in keys) for j in range(rank)]
    shape = [d1] + [maxs[j] - mins[j] + 1 for j in range(rank)]
    arr = np.full(shape, np.nan)
    for k, v in entries.items():
        k = k[1:]
        assert len(v) == d1, (k, len(v), d1)
        arr[(slice(None),) + tuple(k[j] - mins[j] for j in range(rank))] = v
    assert not np.isnan(arr).any(), 'holes in table'
    return np.moveaxis(arr, 0, cpos)


def reduce_gpoints(arr, band, g_axis, weighted):
    """224->112 reduction along g_axis (cmbgb weighting, init.f90:126-155)."""
    ngn = NGN[band]
    wtsm = []
    pos = 0
    for n in ngn:
        wtsm.append(WT[pos:pos + n].sum())
        pos += n
    rwgt = np.empty(16)
    pos = 0
    for igc, n in enumerate(ngn):
        rwgt[pos:pos + n] = WT[pos:pos + n] / wtsm[igc]
        pos += n
    arr = np.moveaxis(arr, g_axis, -1)
    out = np.empty(arr.shape[:-1] + (len(ngn),))
    pos = 0
    for igc, n in enumerate(ngn):
        block = arr[..., pos:pos + n]
        if weighted:
            block = block * rwgt[pos:pos + n]
        out[..., igc] = block.sum(-1)
        pos += n
    return np.moveaxis(out, -1, g_axis)


def parse_kg_file():
    text = open(os.path.join(REF, 'rrtmg_sw_k_g.f90')).read()
    bands = {}
    for band in range(16, 30):
        m = re.search(r'subroutine sw_kgb%d\b(.*?)end subroutine sw_kgb%d'
                      % (band, band), text, re.S)
        raw = parse_fortran_assignments(m.group(1).splitlines())
        arrs = {k: assemble(v) for k, v in raw.items()}
        if band == 29:
            # band 29 scales its quiet-sun irradiance in executable code
            # (rrtmg_sw_k_g.f90:62460-62461) rather than in the table
            arrs['irradnceo'] = arrs['irradnceo'] * (
                13.221 / (13.221 - 0.455))
        bands[band] = arrs
    return bands


def flatten_abs(k):
    """ka(jn?,jt,jp,g) -> absa(rows,g) in Fortran column-major layout
    (rrsw_kg16.f90:66-69: absa(i,g), i = jn + nsp*((jt-1) + 5*(jp-1)))."""
    if k.ndim == 4:
        return np.ascontiguousarray(
            k.transpose(2, 1, 0, 3).reshape(-1, k.shape[-1]))
    assert k.ndim == 3
    return np.ascontiguousarray(
        k.transpose(1, 0, 2).reshape(-1, k.shape[-1]))


def build_kdist():
    bands = parse_kg_file()
    out = {}
    for band, arrs in bands.items():
        ngc = NGC[band - 16]
        for name, arr in arrs.items():
            if name == 'rayl':
                out['b%d_rayl' % band] = arr
                continue
            g_axis = 0 if name in G_FIRST else arr.ndim - 1
            assert arr.shape[g_axis] == 16, (band, name, arr.shape)
            red = reduce_gpoints(arr, band, g_axis, name in K_LIKE)
            assert red.shape[g_axis] == ngc
            if name == 'kao':
                out['b%d_absa' % band] = flatten_abs(red)
            elif name == 'kbo':
                out['b%d_absb' % band] = flatten_abs(red)
            else:
                # strip the trailing 'o' of the original-table name
                out['b%d_%s' % (band, name[:-1])] = red
    return out


def parse_module_tables(filename, subroutine=None):
    text = open(os.path.join(REF, filename)).read()
    if subroutine:
        m = re.search(r'subroutine %s\b(.*?)end subroutine %s'
                      % (subroutine, subroutine), text, re.S)
        text = m.group(1)
    raw = parse_fortran_assignments(text.splitlines())
    return {k: assemble(v) for k, v in raw.items()}


def main():
    out = build_kdist()

    # cloud optics tables (declared in rrsw_cld.f90: extliq1(58,16:29),
    # ssaliq1, asyliq1, extice2(43,16:29), ..., fdlice3(46,16:29),
    # abari(5)/bbari/... Ebert-Curry coefficients; data in init swcldpr)
    cld = parse_module_tables('rrtmg_sw_init.f90', 'swcldpr')
    for k, v in cld.items():
        out['cld_%s' % k] = v

    # ECMWF aerosol band properties (init.f90 swaerpr): parsed as
    # rsrtaua(band)(6,) rows -> (14, 6)
    aer = parse_module_tables('rrtmg_sw_init.f90', 'swaerpr')
    for k, v in aer.items():
        out['aer_%s' % k] = v

    # NRLSSI2 mean-solar-cycle index tables (rrtmg_sw_rad inatm)
    rad = open(os.path.join(REF, 'rrtmg_sw_rad.nomcica.f90')).read()
    lines = rad.splitlines()
    for name in ('mgavgcyc', 'sbavgcyc'):
        start = next(i for i, l in enumerate(lines)
                     if l.strip().startswith('%s(:) = (/' % name))
        solar = parse_fortran_assignments(lines[start:start + 40])
        arr = assemble(solar[name])
        assert arr.shape == (132,), arr.shape
        out[name] = arr

    # MLS reference atmosphere (setcoef swatmref)
    ref = parse_module_tables('rrtmg_sw_setcoef.f90', 'swatmref')
    out['pref'] = ref['pref']
    out['preflog'] = ref['preflog']
    out['tref'] = ref['tref']

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **{k: v.astype(np.float64)
                                for k, v in out.items()})
    size = os.path.getsize(OUT) / 1e6
    print('wrote %s (%.1f MB, %d arrays)' % (OUT, size, len(out)))
    for band in range(16, 30):
        keys = sorted(k for k in out if k.startswith('b%d_' % band))
        print(band, {k.split('_', 1)[1]: np.shape(out[k]) for k in keys})


if __name__ == '__main__':
    main()
