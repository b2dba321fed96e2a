#!/usr/bin/env python
"""Variance-aware native-loader throughput bench (VERDICT r3 #6).

The ledger recorded 10.8k mels/sec (r2 refresh) then 6.1-6.6k (r3 refreshes)
for the SAME loader code (`git log -- native/`: only a pathlib cosmetic change
since f7f1d39) and the SAME bench code (section 6 of bench_suite.py,
unchanged since c27f39a). This tool isolates the measurement: N repeats of
the identical workload on a quiet host, reporting median / IQR / min / max,
plus the pure-numpy fallback path for the speedup ratio.

Run it standalone (never concurrently with TPU benches or the test suite —
the 1-vCPU dev host makes every co-runner a confounder).
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from text_to_sound_synthesis_tpu.data.transforms import to_model_range
from text_to_sound_synthesis_tpu.native import load_mel_batch, native_available


def _python_batch(paths, mel_num, crop_len, tops, lefts):
    """The datasets' pure-numpy fallback (`_load_mels`), inlined here so the
    comparison measures exactly what a T2S_NATIVE_LOADER=0 run pays."""
    out = np.empty((len(paths), mel_num, crop_len), np.float32)
    for i, p in enumerate(paths):
        spec = np.load(p)
        t, l = tops[i], lefts[i]
        win = spec[t: t + mel_num, l: l + crop_len]
        out[i] = to_model_range(win).astype(np.float32)
    return out


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        q = os.path.join(d, f"m{i}.npy")
        np.save(q, rng.random((80, 860)).astype(np.float32))
        paths.append(q)
    tops = [0] * 128
    lefts = list(map(int, rng.integers(0, 13, 128)))

    if not native_available():
        print(json.dumps({"error": "native loader unavailable"}))
        return

    load_mel_batch(paths, 80, 848, tops, lefts)  # warm page cache + build

    def sample(fn):
        rates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(5):
                fn(paths, 80, 848, tops, lefts)
            rates.append(128 * 5 / (time.perf_counter() - t0))
        rates.sort()
        n = len(rates)
        return {
            "median": round(statistics.median(rates), 1),
            "iqr": [round(rates[n // 4], 1), round(rates[(3 * n) // 4], 1)],
            "min": round(rates[0], 1),
            "max": round(rates[-1], 1),
            "n": n,
        }

    native = sample(load_mel_batch)
    python = sample(_python_batch)
    print(json.dumps({
        "config": "native_loader_80x848_mels",
        "unit": "mels/sec",
        "native": native,
        "python": python,
        "speedup_median": round(native["median"] / python["median"], 3),
    }))


if __name__ == "__main__":
    main()
