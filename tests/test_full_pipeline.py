"""The reference's full workflow, chained end-to-end through real CLIs:
retrieval CLI builds the neighbor files (reference retrieve/retrieve_faiss.py
-> {split}.json), then the training CLI consumes them for a train -> test
cycle (reference scripts/train_RCR.sh -> main.py), on synthetic data over
the 8-device CPU mesh."""

import json
import os

import pytest

from fixtures import make_condition_data

TINY_ENC_JSON = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
    "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
}
TINY_DEC_JSON = dict(TINY_ENC_JSON, vocab_size=320, max_position_embeddings=32)


@pytest.mark.slow
def test_retrieve_then_train_then_test(tmp_path, capsys):
    from textreact_tpu.cli.main import main as train_main
    from textreact_tpu.retrieval.cli import main as retrieval_main

    root = make_condition_data(str(tmp_path / "data"))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC_JSON, f)
    with open(os.path.join(root, "dec.json"), "w") as f:
        json.dump(TINY_DEC_JSON, f)

    # 1. retrieval: fingerprint + index + k-NN neighbor files
    nn_out = str(tmp_path / "nn")
    retrieval_main([
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "val.csv", "--test_file", "test.csv",
        "--field", "canonical_rxn", "--output_path", nn_out,
        "--k", "5", "--check_parity",
    ])
    for split in ("train", "val", "test"):
        assert os.path.exists(os.path.join(nn_out, f"{split}.json"))

    # 2. train + test consuming the retrieved neighbors
    save = str(tmp_path / "out")
    train_main([
        "--task", "condition", "--do_train", "--do_test",
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "val.csv", "--test_file", "test.csv",
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--nn_path", nn_out, "--train_nn_file", "train.json",
        "--valid_nn_file", "val.json", "--test_nn_file", "test.json",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "text", "--num_neighbors", "2",
        "--use_gold_neighbor", "--max_length", "64",
        "--max_dec_length", "16", "--batch_size", "8",
        "--test_batch_size", "8", "--epochs", "2", "--lr", "1e-3",
        "--num_beams", "3", "--save_path", save,
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])

    # artifacts of the reference workflow: best/last ckpts, dual-corpus
    # prediction files, metrics log
    assert os.path.exists(os.path.join(save, "best.ckpt"))
    assert os.path.exists(os.path.join(save, "last.ckpt"))
    preds = os.path.join(save, "prediction_test_0.json")
    assert os.path.exists(preds)
    assert os.path.exists(os.path.join(save, "prediction_test_1.json"))
    with open(preds) as f:
        p = json.load(f)
    assert len(p) == 8 and all("prediction" in v and "score" in v
                               for v in p.values())
    out = capsys.readouterr().out
    # two accuracy dicts printed (full + gold-removed corpus)
    acc_lines = [l for l in out.splitlines() if l.startswith('{"1"')]
    assert len(acc_lines) == 2, out[-2000:]
    for line in acc_lines:
        acc = json.loads(line)
        assert set(acc) == {"1", "3", "5", "10", "15"}


@pytest.mark.slow
def test_retro_retrieve_then_train_then_test(tmp_path, capsys):
    """Retro variant of the workflow chain: retrieval CLI over
    product_smiles fingerprints (reference retrieve/retro.sh) feeding the
    template-free retro train CLI through beam test + retro metric."""
    from fixtures import make_retro_data

    from textreact_tpu.cli.main import main as train_main
    from textreact_tpu.retrieval.cli import main as retrieval_main

    root = make_retro_data(str(tmp_path / "data"))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC_JSON, f)
    with open(os.path.join(root, "dec.json"), "w") as f:
        json.dump(dict(TINY_DEC_JSON, vocab_size=600), f)

    nn_out = str(tmp_path / "nn")
    retrieval_main([
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "valid.csv", "--test_file", "test.csv",
        "--field", "product_smiles", "--output_path", nn_out,
        "--k", "4", "--check_parity",
    ])

    save = str(tmp_path / "out")
    train_main([
        "--task", "retro", "--do_train", "--do_test",
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "valid.csv", "--test_file", "test.csv",
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--nn_path", nn_out, "--train_nn_file", "train.json",
        "--valid_nn_file", "val.json", "--test_nn_file", "test.json",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "smiles_text", "--num_neighbors", "2",
        "--max_length", "64", "--max_dec_length", "16",
        "--batch_size", "8", "--test_batch_size", "8", "--epochs", "2",
        "--lr", "1e-3", "--num_beams", "3", "--save_path", save,
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])

    preds = os.path.join(save, "prediction_test_0.json")
    assert os.path.exists(preds)
    with open(preds) as f:
        p = json.load(f)
    assert len(p) == 6 and all(len(v["prediction"]) == 3 for v in p.values())
    out = capsys.readouterr().out
    acc_lines = [l for l in out.splitlines() if l.startswith('{"1"')]
    assert len(acc_lines) == 2, out[-2000:]
    for line in acc_lines:
        assert set(json.loads(line)) == {"1", "2", "3", "5", "10", "20"}
