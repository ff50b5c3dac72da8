"""Stall-robust A/B timing helpers for the r11 optimization round.

The sandbox host exhibits transient multi-second scheduling stalls
(hrtimer warnings in dmesg; the r8->r9 bench drift was adjudicated as
the same machine-state noise).  Naive best-of-N timing taken inside a
stall window fakes 10-30x regressions.  This harness:

- times a single-thread CPU sentinel before and after every sample and
  DISCARDS the sample when the sentinel degrades >1.6x from the session
  floor (a stall window);
- interleaves the variants (A, B, A, B, ...) so slow drift hits both;
- reports per-variant sorted kept-samples and medians.

Usage from a driver script:
    from r11_ab import ab
    ab(spark, {"broadcast": mk_a, "shufflehash": mk_b}, reps=6)
where each mk_* () -> DataFrame builds a fresh frame to noop-write.
"""

from __future__ import annotations

import statistics
import time


def _sentinel() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i
    return time.perf_counter() - t0


def ab(variants: dict, reps: int = 6, warm: int = 1) -> dict[str, list[float]]:
    """variants: name -> zero-arg callable returning a DataFrame."""
    floor = min(_sentinel() for _ in range(3))
    for name, mk in variants.items():
        for _ in range(warm):
            mk().write.format("noop").mode("overwrite").save()
    kept: dict[str, list[float]] = {n: [] for n in variants}
    dropped = 0
    for r in range(reps):
        for name, mk in variants.items():
            df = mk()
            s0 = _sentinel()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            s1 = _sentinel()
            if max(s0, s1) > 1.6 * floor:
                dropped += 1
                continue
            kept[name].append(round(dt, 3))
    for name, ts in kept.items():
        ts.sort()
        med = statistics.median(ts) if ts else float("nan")
        print(f"{name}: median {med:.3f}  kept {ts}")
    if dropped:
        print(f"(dropped {dropped} stall-window samples)")
    return kept
