"""Headline benchmark: TPU retrieval QPS vs CPU exact brute-force baseline.

The BASELINE.json north-star metric is the retrieval engine: exact top-20
L2 search over corpus fingerprints (the reference's faiss.IndexFlatL2 CPU
path, retrieve_faiss.py:62-74) with >=10x QPS/chip target. FAISS is not in
this image, so the baseline is an exact CPU brute-force scan over the SAME
int8 vectors via BLAS (which is what IndexFlatL2 does internally: GEMM +
selection). Parity is asserted before timing.

Round-3 stabilization (VERDICT r2 items 2/6): both sides are best-of-N
(the TPU side was previously a single 5-rep average while the CPU side was
best-of-3 — the asymmetry made the ratio wobble with relay noise), and a
device-only per-call time is measured with an on-device fori_loop over
loop-variant queries (host<->device transfer and the ~30-60 ms fixed relay
cost excluded), reported alongside the end-to-end number.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} (the
driver contract); the device-only figure rides in "unit".

Env overrides: BENCH_N / BENCH_M for corpus / query-batch size (e.g.
BENCH_N=700000 for the USPTO-condition-scale capture recorded in
BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def _init_backend():
    """Initialize the jax backend, tolerating a dead TPU relay.

    VERDICT r3 item 2: when the axon relay's TPU backend is unavailable,
    bench.py must still emit its one-line JSON contract (a degraded record,
    rc=0) instead of dying with a traceback (the BENCH_r03.json failure
    mode). Bounded retry/backoff because relay outages are often transient.
    """
    import jax

    tries = int(os.environ.get("BENCH_BACKEND_TRIES", 3))
    delay = float(os.environ.get("BENCH_BACKEND_BACKOFF", 20.0))
    last = None
    for attempt in range(tries):
        try:
            backend = jax.default_backend()
            jax.devices()
            return jax, backend, None
        except Exception as e:  # relay down / backend init failure
            last = e
            print(f"backend init attempt {attempt + 1}/{tries} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            if attempt + 1 < tries:
                time.sleep(delay)
    # Fall back to CPU so the bench can still prove correctness in
    # interpret mode; mark the record degraded either way.
    try:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import importlib
        import jax as _jax
        backend = _jax.default_backend()
        return _jax, backend, f"tpu_unavailable: {type(last).__name__}"
    except Exception:
        return None, None, f"tpu_unavailable: {type(last).__name__}"


def main():
    jax, backend, degraded = _init_backend()
    if jax is None:
        print(json.dumps({
            "metric": "retrieval_qps_exact_top20", "value": None,
            "unit": "queries/s", "vs_baseline": None,
            "degraded": degraded,
        }))
        return 0
    import jax.numpy as jnp

    from textreact_tpu.ops.topk import numpy_reference_topk, pad_matrix
    from textreact_tpu.retrieval import FlatIndex

    on_tpu = backend not in ("cpu",)
    N, D, K = (200_000, 1024, 20) if on_tpu else (20_000, 256, 20)
    N = int(os.environ.get("BENCH_N", N))
    # large query batch amortizes the host<->device transfer per call
    M = int(os.environ.get("BENCH_M", 8192 if on_tpu else 128))

    rng = np.random.default_rng(0)
    corpus = (rng.random((N, D)) < 0.08).astype(np.int8)
    queries = (rng.random((M, D)) < 0.08).astype(np.int8)

    # --- TPU engine, end-to-end (includes host<->device each call) ---
    index = FlatIndex(corpus, mesh=None, tile_q=128, tile_c=2048,
                      interpret=not on_tpu)
    vals, idx = index.search(queries, k=K)          # compile + warm
    reps = 5 if on_tpu else 1
    rounds = 3 if on_tpu else 1
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            vals, idx = index.search(queries, k=K)
        dt = min(dt, (time.perf_counter() - t0) / reps)
    qps = M / dt

    # --- device-only per-call time: on-device loop, loop-variant queries
    # (NOTES.md relay lesson: per-call timing through the tunnel carries a
    # fixed ~30-60 ms cost and block_until_ready does not wait reliably;
    # only the R-vs-1 loop delta isolates true device time) ---
    # best-effort: never allowed to sink the headline number (a slow or
    # failed device-loop compile degrades to reporting end-to-end only);
    # disable outright with BENCH_DEVICE_ONLY=0
    qps_device = None
    if (on_tpu and index._search_fn is not None
            and os.environ.get("BENCH_DEVICE_ONLY", "1") != "0"):
        try:
            fn = index._search_fn
            qpad = jnp.asarray(pad_matrix(queries, index.tile_q, 128))
            banned = jnp.full((qpad.shape[0], 1), -1, dtype=jnp.int32)

            def make_loop(r):
                @jax.jit
                def loop(q0):
                    def body(i, carry):
                        acc, qq = carry
                        qq = jnp.roll(qq, 1, axis=0)  # keep input loop-variant
                        v, ix = fn(qq, index.corpus, index.norms, banned)
                        return acc + v[0, 0] + ix[0, 0], qq
                    acc, _ = jax.lax.fori_loop(0, r, body,
                                               (jnp.int32(0), q0))
                    return acc
                return loop

            loop_r, loop_1 = make_loop(4), make_loop(1)
            t0 = time.perf_counter()
            float(loop_1(qpad))  # compile + warm
            if time.perf_counter() - t0 > 120:
                raise TimeoutError("device-loop compile too slow; skipping")
            float(loop_r(qpad))
            tr = t1 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop_r(qpad))
                tr = min(tr, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(loop_1(qpad))
                t1 = min(t1, time.perf_counter() - t0)
            per_call = max((tr - t1) / 3, 1e-9)
            qps_device = M / per_call
        except Exception as e:
            print(f"device-only timing skipped: {e}", file=sys.stderr)

    # --- correctness: exact parity with float64 brute force on a sample ---
    sample = queries[:64]
    ref_vals, ref_idx = numpy_reference_topk(sample, corpus, K)
    got_vals, got_idx = index.search(sample, k=K)
    assert np.array_equal(got_idx, ref_idx), "retrieval parity FAILED"
    assert np.array_equal(got_vals, ref_vals), "distance parity FAILED"

    # --- CPU exact baseline (faiss-flat equivalent: GEMM + top-k) ---
    # best-of-3 so OS noise on the shared host can only make the reported
    # speedup ratio conservative
    mb = 64
    qf = queries[:mb].astype(np.float32)
    cf = corpus.astype(np.float32)
    cn = (cf * cf).sum(1)
    cpu_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d2 = (qf * qf).sum(1)[:, None] - 2.0 * (qf @ cf.T) + cn[None, :]
        part = np.argpartition(d2, K, axis=1)[:, :K]
        pv = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(pv, axis=1, kind="stable")
        _ = np.take_along_axis(part, order, axis=1)
        cpu_dt = min(cpu_dt, time.perf_counter() - t0)
    cpu_qps = mb / cpu_dt

    dev_note = (f", device-only {qps_device/1e3:.1f}k qps"
                if qps_device else "")
    out = {
        "metric": "retrieval_qps_exact_top20",
        "value": round(qps, 1),
        "unit": (f"queries/s (N={N}, d={D}, k={K}, "
                 f"{'tpu' if on_tpu else 'cpu-interpret'}{dev_note})"),
        "vs_baseline": round(qps / cpu_qps, 2),
    }
    if degraded:
        out["degraded"] = degraded
    print(json.dumps(out))
    return 0


def _watchdog(timeout_s):
    """Emit the degraded record and exit 0 if the run wedges.

    The round-3 relay failure mode was an indefinite hang (a 128x128 matmul
    blocked 6+ hours while device enumeration kept succeeding); SIGALRM is
    the only reliable way out because block_until_ready never returns.
    """
    import signal

    def on_alarm(signum, frame):
        print(json.dumps({
            "metric": "retrieval_qps_exact_top20", "value": None,
            "unit": "queries/s", "vs_baseline": None,
            "degraded": f"hang_watchdog_{timeout_s}s",
        }), flush=True)
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout_s)


if __name__ == "__main__":
    _watchdog(int(os.environ.get("BENCH_TIMEOUT", 1500)))
    try:
        sys.exit(main())
    except Exception as e:
        # The one-line contract must survive anything (e.g. the relay dying
        # mid-run AFTER device enumeration succeeded — the r3 outage mode).
        import traceback
        traceback.print_exc()
        print(json.dumps({
            "metric": "retrieval_qps_exact_top20", "value": None,
            "unit": "queries/s", "vs_baseline": None,
            "degraded": f"runtime_failure: {type(e).__name__}",
        }))
        sys.exit(0)
