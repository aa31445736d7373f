"""Worker for the 2-process DCN-gather test (spawned by test_multihost.py).

Each process holds a disjoint (plus one overlapping, DistributedSampler-style
padded) shard of id-keyed predictions/scores; after the gather both must see
the full union, and only process 0 writes the prediction file.
"""

import json
import os
import sys


def main() -> None:
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    from textreact_tpu.parallel.multihost import (gather_prediction_dict,
                                                  gather_score_dict,
                                                  is_primary)

    # predictions: ids 0..4 on p0, 4..8 on p1 (id 4 duplicated by padding)
    local_pred = {
        i: {"prediction": [[f"tok{i}a"], [f"tok{i}b"]], "score": [-float(i), -9.0]}
        for i in range(pid * 4, pid * 4 + 5)
    }
    merged = gather_prediction_dict(local_pred)
    assert sorted(merged) == list(range(9)), sorted(merged)
    assert merged[7]["prediction"] == [["tok7a"], ["tok7b"]], merged[7]

    local_scores = {i: float(i) / 10 for i in range(pid * 4, pid * 4 + 5)}
    scores = gather_score_dict(local_scores)
    assert sorted(scores) == list(range(9)), sorted(scores)

    if is_primary():
        with open(os.path.join(out_dir, "prediction_test_0.json"), "w") as f:
            json.dump(merged, f)
    print(f"worker {pid} ok")


if __name__ == "__main__":
    main()
