#!/usr/bin/env python
"""Batched-scanner wall-clock at the reference's UI ceiling.

The reference scanner's maximum universe is 300 tickers
(`/root/reference/app.py:1290-1295`, the "Number of stocks to scan"
slider); round 4 benched only 50.  Run on the chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/scanner_bench.py 300

Synthetic tickers share one series length, so the whole universe lands in
ONE length group, chunked into device_batch-wide programs (one compile,
reused; see api/batch_scan.py on why wide programs crash the worker);
wall-clock through the relay is the honest end-to-end number.

Round-5 measurements (TPU v5e through the relay, device_batch=30):
  300 tickers: 565.1 s end-to-end, 0 failures (the reference UI ceiling)
   60 tickers: 412.5 s  -> marginal rate ~0.64 s/ticker; the shared
  ~375 s is the one-time compile of the three chunk programs.
  100 tickers at device_batch=50: TPU worker crash (reproducible), the
  measurement that set the 30-wide default.
"""

import sys
import time

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

import jax  # noqa: E402

from montecarlo_tpu.api.batch_scan import scan_tickers_batched  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    device_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    tickers = [f"SYN{i:03d}" for i in range(n)]
    print(f"platform: {jax.devices()[0].platform} "
          f"device_batch={device_batch}")
    marks = {}

    def cb(done, total, _out):
        if done not in marks:
            marks[done] = time.perf_counter()
            print(f"  {done}/{total} at +{marks[done] - t0:.1f}s",
                  file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    res = scan_tickers_batched(tickers, provider="synthetic",
                               progress_callback=cb,
                               device_batch=device_batch)
    dt = time.perf_counter() - t0
    print(f"{n} tickers in {dt:.1f}s ({dt / n * 1000:.0f} ms/ticker); "
          f"results={len(res.results)} failed={len(res.failed)}")


if __name__ == "__main__":
    main()
