#!/usr/bin/env python3
"""Measure the reference pipeline's single-node throughput on its own
golden corpus (it publishes no numbers — this produces the baseline our
bench is compared against).

Loads /root/reference/scripts/ufz_water_qc_pipeline.py with matplotlib
stubbed out (not installed here, and the plot layer is out of scope),
rebuilds the input frame from the committed golden parquet's __raw
columns (the original CSV is not in the repo; __raw IS the input), and
times `process_variable` per variable with plots disabled and default
parameters — the same compute our GoldenSpec suites replicate.

Dev tool only (driver-side python); the engine itself has no Python.
"""
import importlib.util
import sys
import time
import types
import warnings

import numpy as np
import pandas as pd

REF = "/root/reference/scripts/ufz_water_qc_pipeline.py"
GOLDEN = ("/root/reference/scripts/water_qc_output/processed/"
          "Erkenruh_Einruhr/Erkenruh_Einruhr__qc_timeseries.parquet")


def stub_matplotlib():
    class _Any:
        def __init__(self, *a, **k): pass
        def __call__(self, *a, **k): return self
        def __getattr__(self, name): return _Any()
        def __iter__(self): return iter([])
        def __getitem__(self, k): return _Any()
        def __setitem__(self, k, v): pass
    for name in ("matplotlib", "matplotlib.pyplot", "matplotlib.dates",
                 "matplotlib.colors", "matplotlib.ticker"):
        mod = types.ModuleType(name)
        mod.__getattr__ = lambda attr, _A=_Any: _A()
        sys.modules[name] = mod
    sys.modules["matplotlib"].use = lambda *a, **k: None
    sys.modules["matplotlib.colors"].ListedColormap = _Any
    sys.modules["matplotlib.ticker"].MaxNLocator = _Any


def main():
    warnings.filterwarnings("ignore")
    stub_matplotlib()
    spec = importlib.util.spec_from_file_location("refpipe", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    golden = pd.read_parquet(GOLDEN)
    raw_cols = [c for c in golden.columns if c.endswith("__raw")]
    df = pd.DataFrame(
        {c[: -len("__raw")]: golden[c].astype(float) for c in raw_cols},
        index=golden.index)
    print(f"input: {len(df)} rows x {len(raw_cols)} variables "
          f"({df.index.min()} .. {df.index.max()})")

    # plot functions are the report layer -> no-op them (figures are the
    # only side effects; the compute path is untouched)
    for name in dir(ref):
        if name.startswith("plot_") or name in ("qc_compare_plot",):
            setattr(ref, name, lambda *a, **k: None)
    ref.wrtds_buster = lambda *a, **k: (
        pd.Series(False, index=a[0].index) if a else None)

    outs = ref.build_structure("/tmp/ref_timing_out", "Erkenruh_Einruhr")
    t0 = time.time()
    per = {}
    for col in df.columns:
        t1 = time.time()
        ref.process_variable(df, col, "Erkenruh_Einruhr", outs,
                             apply_saqc=True, apply_sentem=False)
        per[col] = time.time() - t1
    total = time.time() - t0
    for c, t in per.items():
        print(f"  {c}: {t:.2f} s")
    print(f"reference process_variable total ({len(df)} rows x "
          f"{len(per)} vars, saqc-fallback path, plots/sentem off): "
          f"{total:.2f} s")


if __name__ == "__main__":
    main()
