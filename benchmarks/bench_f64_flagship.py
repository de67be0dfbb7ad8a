"""Flagship-scale float64 point (round-3 verdict item #6/#7): one n=1M
f64 fused-symmetric row next to the f32 flagship, completing the
precision-parity story (the reference's native precision is double;
on this TPU f64 is EMULATED — docs/PERF.md round-2 measured ~8.8x f32
per-cycle cost at n=65,536; this measures the same ratio at the full
flagship scale).

Usage: python benchmarks/bench_f64_flagship.py [--small]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_all import bench_sym  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    import jax
    if args.small:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        jax.config.update("jax_enable_x64", True)
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1)
        except Exception:
            pass

    nx = 128 if args.small else 1024
    n = nx * nx
    ncv, nev = 32, 8
    plat = jax.devices()[0].platform
    print(f"## f64 flagship point (platform: {plat}, n={n}, ncv={ncv})\n")
    print("| dtype | ms/cycle | ms/matvec (np=24/cycle) | Gnnz/s | "
          "ratio vs f32 |")
    print("|---|---|---|---|---|")
    rows = {}
    for dt in (np.float32, np.float64):
        per_cycle, c = bench_sym(nx, ncv, nev, dt, cycles=12)
        per_mv = per_cycle / (ncv - nev)
        rows[dt] = per_mv
        ratio = rows[dt] / rows[np.float32]
        print(f"| {np.dtype(dt).name} | {per_cycle*1e3:.1f} "
              f"| {per_mv*1e3:.3f} | {5*n/per_mv/1e9:.2f} "
              f"| {ratio:.2f} |", flush=True)


if __name__ == "__main__":
    main()
