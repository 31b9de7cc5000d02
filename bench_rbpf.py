"""Standalone RBPF benchmark at both reference (P=40) and BASELINE
(P=500) scales. The P=500 line is what `bench.py` (the driver benchmark)
emits; this script adds the P=40 point for the direct apples-to-apples
row against the reference's 40-particle CPU budget. Methodology
(per-scan dispatch, donated state, best-of) lives in
:func:`bench.bench_rbpf`.
"""

import json

import jax

from bench import bench_rbpf


def main():
    print("devices:", jax.devices(), flush=True)
    for p in (40, 500):
        print(json.dumps(bench_rbpf(p=p)), flush=True)


if __name__ == "__main__":
    main()
