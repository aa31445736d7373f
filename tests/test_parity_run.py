"""Smoke-test for the one-command real-data parity driver (VERDICT r2 item
8): on synthetic fixtures, scripts/parity_run.py must chain retrieval ->
train -> dual-corpus test and record the accuracy rows in
parity_results.json — the exact command that produces the BASELINE.md
accuracy rows when the USPTO artifacts + SciBERT checkpoint exist."""

import json
import os
import sys

import pytest

from fixtures import make_condition_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY_ENC = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
}
TINY_DEC = dict(TINY_ENC, vocab_size=320, max_position_embeddings=32)


@pytest.mark.slow
def test_parity_run_rcr_smoke(tmp_path):
    import parity_run

    root = make_condition_data(str(tmp_path / "data"))
    for name, cfg in (("enc.json", TINY_ENC), ("dec.json", TINY_DEC)):
        with open(os.path.join(root, name), "w") as f:
            json.dump(cfg, f)
    save = str(tmp_path / "out")
    override = " ".join([
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "text",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--max_length", "64", "--max_dec_length", "16",
        "--batch_size", "8", "--test_batch_size", "8",
        "--epochs", "1", "--num_beams", "3", "--num_neighbors", "2",
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])
    rc = parity_run.main([
        "--recipe", "RCR", "--data_path", root,
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--save_path", save, "--override", override,
    ])
    assert rc == 0
    # neighbor files were built by the fingerprint retriever leg
    for split in ("train", "val", "test"):
        assert os.path.exists(os.path.join(save, "nn", f"{split}.json"))
    with open(os.path.join(save, "parity_results.json")) as f:
        results = json.load(f)
    assert results["recipe"] == "RCR"
    accs = results["accuracy"]
    # dual-corpus reporting: full + gold-removed (reference README.md:68-71)
    assert isinstance(accs, list) and len(accs) == 2
    for acc in accs:
        assert set(int(k) for k in acc) == {1, 3, 5, 10, 15}
        assert all(0.0 <= v <= 1.0 for v in acc.values())
