"""Crash recovery: a real SIGKILL mid-epoch, restart, resume from the last
atomically-published checkpoint with exact loss continuity.

The reference gets restart-and-resume from Lightning (main.py:389-397:
resume from save_path/<load_ckpt> unless --overwrite). Here the train loop
checkpoints asynchronously with atomic publish (train/checkpoint.py), so a
kill -9 must (a) never leave a visible half checkpoint, (b) lose at most
the epochs since the last completed publish, and (c) — because the data
order is keyed (seed, epoch, index) and the dropout rng by state.step —
replay to EXACTLY the state an uninterrupted run reaches: overlapping
logged train_loss values match and the final checkpoints are bit-identical.
"""

import json
import os
import signal
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_condition_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_ENC_JSON = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
    "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
}
TINY_DEC_JSON = dict(TINY_ENC_JSON, vocab_size=320, max_position_embeddings=32)


def _train_argv(root, save):
    return [
        "--task", "condition", "--do_train",
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "val.csv", "--test_file", "test.csv",
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--nn_path", root, "--train_nn_file", "train_nn.json",
        "--valid_nn_file", "val_nn.json", "--test_nn_file", "test_nn.json",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "text", "--num_neighbors", "2",
        "--use_gold_neighbor", "--max_length", "64",
        "--max_dec_length", "16", "--batch_size", "8",
        "--epochs", "4", "--lr", "1e-3", "--save_path", save,
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ]


def _run_worker(crash_at, argv):
    worker = os.path.join(REPO, "tests", "_crash_train_worker.py")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    proc = subprocess.run(
        [sys.executable, worker, str(crash_at)] + argv,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, cwd=REPO, timeout=900)
    return proc


def _losses_by_step(path):
    rows = []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if "train_loss" in r:
                rows.append(r)
    return rows


@pytest.mark.slow
def test_sigkill_mid_epoch_resumes_with_loss_continuity(tmp_path):
    root = make_condition_data(str(tmp_path / "data"))
    for name, js in [("enc.json", TINY_ENC_JSON), ("dec.json", TINY_DEC_JSON)]:
        with open(os.path.join(root, name), "w") as f:
            json.dump(js, f)

    # --- reference: uninterrupted 4-epoch run ---
    save_a = str(tmp_path / "out_uninterrupted")
    proc = _run_worker(0, _train_argv(root, save_a))
    assert proc.returncode == 0, proc.stdout.decode()[-3000:]

    # --- victim: killed with SIGKILL before step 9 (mid-epoch 2 of
    # 3-step epochs), after epoch-0/1 checkpoints were async-published ---
    save_b = str(tmp_path / "out_crashed")
    proc = _run_worker(8, _train_argv(root, save_b))
    assert proc.returncode == -signal.SIGKILL, (proc.returncode,
                                                proc.stdout.decode()[-2000:])
    # atomic publish: no visible half checkpoint, published ones complete
    assert not any(e.endswith(".ckpt.tmp") and os.listdir(os.path.join(save_b, e)) == []
                   for e in os.listdir(save_b)), os.listdir(save_b)
    assert os.path.isdir(os.path.join(save_b, "best.ckpt")), os.listdir(save_b)
    pre_crash = _losses_by_step(os.path.join(save_b, "metrics.jsonl"))
    assert len(pre_crash) >= 7, pre_crash  # ran into epoch 2

    # --- restart: same command, no --overwrite -> resume ---
    proc = _run_worker(0, _train_argv(root, save_b))
    out = proc.stdout.decode()
    assert proc.returncode == 0, out[-3000:]
    with open(os.path.join(save_b, "metrics.jsonl")) as f:
        resume_recs = [json.loads(l) for l in f if "resumed_at_epoch" in l]
    assert resume_recs, "restart did not resume from a published checkpoint"
    assert resume_recs[-1]["resumed_from"] == "best"
    assert resume_recs[-1]["resumed_at_epoch"] >= 1, resume_recs

    # --- loss continuity: replayed steps produce EXACTLY the pre-crash
    # losses (deterministic data order + step-keyed dropout rng) ---
    all_rows = _losses_by_step(os.path.join(save_b, "metrics.jsonl"))
    resumed = all_rows[len(pre_crash):]
    assert resumed, all_rows
    pre_by_step = {r["step"]: r["train_loss"] for r in pre_crash}
    overlap = [(r["train_loss"], pre_by_step[r["step"]])
               for r in resumed if r["step"] in pre_by_step]
    assert overlap, (pre_crash, resumed)
    got, want = zip(*overlap)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # --- end state: crashed+resumed == uninterrupted, bit-identical ---
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree_a = ckptr.restore(os.path.join(save_a, "last.ckpt"))
    tree_b = ckptr.restore(os.path.join(save_b, "last.ckpt"))
    import jax
    leaves_a, treedef_a = jax.tree.flatten(tree_a)
    leaves_b, treedef_b = jax.tree.flatten(tree_b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    with open(os.path.join(save_a, "last.meta.json")) as f:
        meta_a = json.load(f)
    with open(os.path.join(save_b, "last.meta.json")) as f:
        meta_b = json.load(f)
    assert meta_a["epoch"] == meta_b["epoch"] == 3
