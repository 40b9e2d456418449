"""DRAM-bandwidth hog for bench-calibration experiments (VERDICT r5 #1).

Runs N daemon threads of an endless STREAM-triad over private ~100 MB
working sets: saturates the socket's memory bandwidth while leaving most
cores idle (default 6 threads on a 32-core box ≈ 19% CPU, ~full DRAM).
Used to create a controlled memory-steal regime and show that the bench's
multi-core walls and the multi-threaded memory probe move TOGETHER while
the single-thread cache-resident CPU probe stays flat — the decidability
evidence for queries_normalized_mem. Ctrl-C / SIGTERM to stop.

Usage: python tools/mem_hog.py [n_threads]
"""

from __future__ import annotations

import sys
import threading

import numpy as np


def triad_forever(i: int) -> None:
    n = (100 * 2**20) // 24  # ~100 MB of (a, b, c) float64 per thread
    rng = np.random.default_rng(i)
    a, b, c = np.zeros(n), rng.random(n), rng.random(n)
    while True:
        np.multiply(c, 3.0, out=a)
        a += b


def main() -> None:
    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    for i in range(n_threads):
        threading.Thread(target=triad_forever, args=(i,), daemon=True).start()
    print(f"hogging DRAM with {n_threads} triad threads; SIGTERM to stop",
          flush=True)
    threading.Event().wait()


if __name__ == "__main__":
    main()
