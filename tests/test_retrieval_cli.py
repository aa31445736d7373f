"""Retrieval CLI end-to-end on fixture CSVs + format converter."""

import json
import os

import numpy as np

from textreact_tpu.retrieval import convert_tevatron_jsonl
from textreact_tpu.retrieval.cli import main as retrieval_main

from fixtures import make_condition_data, make_retro_data


def test_condition_retrieval_cli(tmp_path, capsys):
    root = make_condition_data(str(tmp_path / "data"))
    out = str(tmp_path / "out")
    retrieval_main([
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "val.csv", "--test_file", "test.csv",
        "--field", "canonical_rxn", "--output_path", out,
        "--k", "5", "--check_parity",
    ])
    for split in ("train", "val", "test"):
        with open(os.path.join(out, f"{split}.json")) as f:
            nn = json.load(f)
        assert all(len(r["nn"]) == 5 for r in nn)
        assert all(isinstance(r["id"], str) for r in nn)
    # train self-retrieval: nearest neighbor of a train row is itself
    with open(os.path.join(out, "train.json")) as f:
        train_nn = json.load(f)
    self_hits = sum(r["nn"][0] == r["id"] for r in train_nn)
    assert self_hits >= len(train_nn) * 0.5  # duplicates may tie-break earlier
    # fingerprint cache reused on second run
    assert os.path.exists(os.path.join(out, "train_fp.npy"))
    # condition report printed
    assert "Top-1" in capsys.readouterr().out


def test_retro_retrieval_cli_with_year_filter(tmp_path):
    root = make_retro_data(str(tmp_path / "data"))
    out = str(tmp_path / "out")
    retrieval_main([
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "valid.csv", "--test_file", "test.csv",
        "--field", "product_smiles", "--output_path", out,
        "--k", "4", "--before", "2010", "--check_parity",
    ])
    with open(os.path.join(out, "test.json")) as f:
        nn = json.load(f)
    assert all(len(r["nn"]) == 4 for r in nn)


def test_convert_tevatron(tmp_path):
    records = [
        {"query_id": "q1", "negative_passages": [{"docid": "a"}, {"docid": "b"}]},
        {"query_id": "q2", "negative_passages": [{"docid": "c"}]},
    ]
    inp = tmp_path / "in.jsonl"
    with open(inp, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    outp = tmp_path / "out.json"
    n = convert_tevatron_jsonl(str(inp), str(outp))
    assert n == 2
    with open(outp) as f:
        out = json.load(f)
    assert out == [{"id": "q1", "nn": ["a", "b"]}, {"id": "q2", "nn": ["c"]}]


def test_debug_cli_bruteforce(tmp_path):
    from textreact_tpu.retrieval.debug_cli import main as debug_main
    import pandas as pd
    train = pd.DataFrame({"canonical_rxn": ["CCO>>CCN", "CC>>CO", "CCC>>CCO"]})
    test = pd.DataFrame({"canonical_rxn": ["CCO>>CCN", "CC>>CN"]})
    train.to_csv(tmp_path / "train.csv", index=False)
    test.to_csv(tmp_path / "test.csv", index=False)
    out = tmp_path / "nn.json"
    debug_main(["--train_file", str(tmp_path / "train.csv"),
                "--test_file", str(tmp_path / "test.csv"),
                "--output", str(out), "--limit", "2", "--top", "3"])
    data = json.loads(out.read_text())
    assert set(data.keys()) == {"0", "1"}
    # identical reaction ranks itself first with similarity 1.0
    assert data["0"]["rank"][0] == 0
    assert data["0"]["similarity"][0] == 1.0


def test_condition_retrieval_cli_sharded(tmp_path):
    """--shard_corpus path over the fake 8-device mesh."""
    root = make_condition_data(str(tmp_path / "data"))
    out = str(tmp_path / "out")
    retrieval_main([
        "--data_path", root, "--train_file", "train.csv",
        "--valid_file", "val.csv", "--test_file", "test.csv",
        "--field", "canonical_rxn", "--output_path", out,
        "--k", "5", "--check_parity", "--shard_corpus",
    ])
    with open(os.path.join(out, "test.json")) as f:
        nn = json.load(f)
    assert all(len(r["nn"]) == 5 for r in nn)
