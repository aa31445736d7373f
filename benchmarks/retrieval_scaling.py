"""QPS-vs-N curve for the exact top-20 retrieval engine on one chip.

VERDICT r3 item 8: the engine is measured to N=700k (USPTO-condition
scale); this probes where the default query-outer layout (corpus
re-streamed from HBM per query tile) breaks down as the corpus grows
toward N=10M, and whether the opt-in corpus-resident grid layout
(stream the corpus once, queries resident) wins past some N.

At d=1024 int8, N=10M is a 10.24 GB on-chip corpus (v5e: 16 GB HBM), so
the whole sweep keeps the corpus HBM-resident like the reference's
faiss.IndexFlatL2 keeps it RAM-resident (retrieve_faiss.py:62-74).
Host-side corpus generation is slabbed to avoid the float64 temporary
(~80 GB at N=10M on this 1-vCPU host).

Usage: python benchmarks/retrieval_scaling.py [N ...]
       (default sweep: 200k 700k 2M 5M 10M; layouts: query-outer always,
        corpus-resident at N >= 2M)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import numpy as np

D, K, M = 1024, 20, 8192


def make_corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    out = np.empty((n, D), np.int8)
    slab = 250_000
    for i in range(0, n, slab):
        j = min(i + slab, n)
        out[i:j] = (rng.random((j - i, D)) < 0.08).astype(np.int8)
    return out


def bench(corpus, queries, corpus_resident):
    from textreact_tpu.retrieval import FlatIndex

    index = FlatIndex(corpus, mesh=None, tile_q=128, tile_c=2048,
                      corpus_resident=corpus_resident)
    vals, idx = index.search(queries, k=K)   # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        vals, idx = index.search(queries, k=K)
        best = min(best, time.perf_counter() - t0)
    # spot parity on a 16-query sample (full float64 oracle at N=10M is
    # minutes on the 1-vCPU host; 16 rows keeps it ~seconds per N)
    from textreact_tpu.ops.topk import numpy_reference_topk
    rv, ri = numpy_reference_topk(queries[:16], corpus, K)
    gv, gi = index.search(queries[:16], k=K)
    assert np.array_equal(gi, ri) and np.array_equal(gv, rv), "parity FAILED"
    return queries.shape[0] / best


def main():
    sizes = [int(float(a)) for a in sys.argv[1:]] or \
        [200_000, 700_000, 2_000_000, 5_000_000, 10_000_000]
    rng = np.random.default_rng(1)
    queries = (rng.random((M, D)) < 0.08).astype(np.int8)
    print(f"{'N':>10s} {'layout':>16s} {'qps':>10s}", flush=True)
    for n in sizes:
        corpus = make_corpus(n)
        for resident in ([False] if n < 2_000_000 else [False, True]):
            name = "corpus-resident" if resident else "query-outer"
            try:
                qps = bench(corpus, queries, resident)
                print(f"{n:>10d} {name:>16s} {qps:>10.0f}", flush=True)
            except Exception as e:
                print(f"{n:>10d} {name:>16s}     FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        del corpus


if __name__ == "__main__":
    main()
