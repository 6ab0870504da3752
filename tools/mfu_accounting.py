#!/usr/bin/env python
"""Per-mode efficiency accounting: FLOP/img, achieved TFLOP/s, % of the
v5e ceiling, and the dominant bound (VERDICT r4 item 3).

The xl mode has had a real ceiling analysis since round 2 (U-Net 73% MXU /
VAE 82%) and flux is pegged at ~83% of its int8-weight-only peak; the other
modes carried throughput numbers with no efficiency context — "55 img/s
pixart" is unfalsifiable as "fast" until the FLOP/img and ceiling are
published. This tool closes that for ALL six bench modes:

  per mode: build the exact bench.py step, AOT-compile the SINGLE step
  (not the fori_loop — XLA's HLO cost analysis visits a while body once,
  undercounting by iters×), read ``cost_analysis()`` flops + bytes
  accessed, then measure throughput with bench.run_mode's fori_loop +
  host-readback discipline and derive:

    TFLOP/s        = FLOP/img × img/s
    % MXU peak     vs the v5e nameplate (197 TFLOP/s bf16 — flux int8
                     projections still count their MACs as flops here)
    % measured MXU vs the 111-114 TFLOP/s a pure matmul/conv probe
                     actually reaches on THIS chip (tools/perf_probe.py) —
                     the realistic speed-of-light
    HBM GB/s       = bytes-accessed/img × img/s (XLA's estimate counts
                     every operand read+write at HBM, so this OVERSTATES
                     true HBM traffic where fusion keeps values in VMEM —
                     use as an upper bound on bandwidth demand)
    bound          = MXU if %measured-MXU exceeds %HBM-819, else HBM

Usage: python tools/mfu_accounting.py [mode ...]   (default: all six)
Batch/iters follow bench.py's envs (BENCH_BATCH etc.).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

V5E_BF16_TFLOPS = 197.0     # nameplate MXU peak
V5E_MEASURED_TFLOPS = 113.0  # matmul/conv probe ceiling on this chip
V5E_HBM_GBS = 819.0          # nameplate HBM bandwidth

MODES = {
    'xl': (bench.bench_xl, 2, 'BENCH_BATCH'),
    'maps': (bench.bench_maps, 2, 'BENCH_BATCH'),
    'pixart': (bench.bench_pixart, 2, 'BENCH_BATCH'),
    'flux': (bench.bench_flux, 2, 'BENCH_BATCH_FLUX'),
    'hunyuan': (bench.bench_hunyuan, 2, 'BENCH_BATCH_HUNYUAN'),
    'if': (bench.bench_if, 1, 'BENCH_BATCH'),
}


def account(mode, iters):
    import jax
    builder, img_idx, batch_env = MODES[mode]
    on_tpu = jax.devices()[0].platform == 'tpu'
    default = {'BENCH_BATCH': '16', 'BENCH_BATCH_FLUX': '4',
               'BENCH_BATCH_HUNYUAN': '8'}[batch_env]
    batch = int(os.environ.get(batch_env, default if on_tpu else '1'))

    step, args = builder(batch)
    rng = jax.random.PRNGKey(0)
    compiled = jax.jit(step).lower(*args, rng).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca['flops'])
    byt = float(ca.get('bytes accessed', 0.0))

    r = bench.run_mode(step, args, batch, iters, f'{mode}', 8.0,
                       img_idx=img_idx)
    img_per_s = r['value']

    flop_per_img = flops / batch
    tflops = flop_per_img * img_per_s / 1e12
    hbm_gbs = (byt / batch) * img_per_s / 1e9
    pct_nameplate = 100 * tflops / V5E_BF16_TFLOPS
    pct_measured = 100 * tflops / V5E_MEASURED_TFLOPS
    pct_hbm = 100 * hbm_gbs / V5E_HBM_GBS
    return {
        'mode': mode,
        'batch': batch,
        'img_per_s': img_per_s,
        'gflop_per_img': round(flop_per_img / 1e9, 1),
        'tflop_per_s': round(tflops, 1),
        'pct_mxu_nameplate': round(pct_nameplate, 1),
        'pct_mxu_measured': round(pct_measured, 1),
        'xla_bytes_gib_per_img': round(byt / batch / 2**30, 2),
        'hbm_gbs_upper_bound': round(hbm_gbs, 0),
        'pct_hbm_upper_bound': round(pct_hbm, 1),
        'bound': 'MXU' if pct_measured >= pct_hbm else 'HBM?',
    }


def main():
    modes = sys.argv[1:] or list(MODES)
    import jax
    on_tpu = jax.devices()[0].platform == 'tpu'
    iters = int(os.environ.get('BENCH_ITERS', '10' if on_tpu else '2'))
    for m in modes:
        print(json.dumps(account(m, iters)))


if __name__ == '__main__':
    main()
