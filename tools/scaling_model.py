"""Scaling-efficiency estimate for the m-sharded moist GCM.

Only ONE physical TPU chip exists in this environment, so multi-chip
wall-clock cannot be measured; what CAN be grounded is (a) the measured
single-chip step time (bench.py) and (b) the exact collective volume the
m-sharded DistributedSHT path moves per step (every all_to_all transpose
is enumerated from the step's transform calls).  This tool combines them
into the standard alpha-beta estimate

    efficiency(L) = t_compute(L) / (t_compute(L) + t_comm(L)),
    t_compute(L)  = t_1chip / L          (physics is column-local;
                                          FFT/Legendre/solves divide by L)
    t_comm(L)     = n_transposes * alpha + bytes_sent_per_device / beta

with stated hardware assumptions (TPU v5e: beta = 100 GB/s effective
per-chip ICI all_to_all bandwidth — half the 200 GB/s peak, covering
torus routing — and alpha = 5 us per collective launch).  Run:
    python tools/scaling_model.py [--step-seconds S]
Prints a table and one JSON line consumed by the judge/bench notes.

Transform census per fused moist step (m-sharded spectral mode,
dycore/spectral_dynamics.py explicit_tendencies + step):
  uv_from_vort_div        1 transpose x 2*nz fields
  synthesize              5 calls: vort, div, T, q, lnps -> 4*nz+1
  gradient(lnps)          1 transpose x 2
  gradient(T), gradient(q)  2 transposes x 2*nz each
  analyze                 4 calls: E+Phi, dT, dq, dlnps -> 3*nz+1
  vort_div_analysis       1 transpose x 2*nz
(fv moisture mode drops gradient(q), synthesize(q) and analyze(dq):
3*nz fewer fields).  Each field is one (nlat, m_block) complex64 slab
per device; an L-way tiled all_to_all sends (L-1)/L of it.
"""

import argparse
import json

NLON, NLAT, NZ = 256, 128, 28          # T85 bench configuration
TRUNC = 85
BYTES_PER = 8                          # complex64
ALPHA = 5e-6                           # per-collective launch (s)
BETA = 100e9                           # effective ICI B/W per chip (B/s)
DEFAULT_STEP = 256 * 128 * 28 / 7.22e6  # s, from BENCH r4: 7.22M gps/s


def fields_per_step(nz, fv=False):
    n = (2 * nz            # uv_from_vort_div
         + 4 * nz + 1      # synthesize x5
         + 2                # gradient lnps
         + 2 * nz + 2 * nz  # gradient T, q
         + 3 * nz + 1      # analyze x4
         + 2 * nz)         # vort_div_analysis
    if fv:
        n -= 3 * nz        # no spectral q transforms
    return n


def transposes_per_step(fv=False):
    return 14 if not fv else 11


def model(L, step_1chip, fv=False):
    m_block = -(-(TRUNC + 1) // L)     # ceil(M / L)
    nfields = fields_per_step(NZ, fv)
    bytes_sent = (nfields * NLAT * m_block * BYTES_PER) * (L - 1) / L
    t_comm = transposes_per_step(fv) * ALPHA + bytes_sent / BETA
    t_comp = step_1chip / L
    return t_comp / (t_comp + t_comm), bytes_sent, t_comm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--step-seconds', type=float, default=DEFAULT_STEP,
                    help='measured single-chip step time (s)')
    ap.add_argument('--fv', action='store_true',
                    help='fv moisture mode (fewer spectral transforms)')
    args = ap.parse_args()

    rows = {}
    print('T85 moist GCM, m-sharded over L chips '
          '(t_1chip = %.1f ms; alpha=%.0f us, beta=%.0f GB/s):'
          % (args.step_seconds * 1e3, ALPHA * 1e6, BETA / 1e9))
    print('%4s %12s %12s %12s' % ('L', 'MB/dev/step', 't_comm (us)',
                                  'efficiency'))
    for L in (2, 4, 8, 16, 32, 64):
        eff, bytes_sent, t_comm = model(L, args.step_seconds, args.fv)
        rows['%d' % L] = round(eff, 4)
        print('%4d %12.2f %12.1f %11.1f%%'
              % (L, bytes_sent / 1e6, t_comm * 1e6, eff * 100))
    print(json.dumps({
        'metric': 'modeled_scaling_efficiency',
        'config': 'T85 moist GCM, m-sharded spectral',
        'assumptions': {'alpha_s': ALPHA, 'beta_Bps': BETA,
                        'step_1chip_s': args.step_seconds},
        'efficiency_by_chips': rows}))


if __name__ == '__main__':
    main()
